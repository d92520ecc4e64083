from .subset import FkEdge, SubsetResult, subset_closure, verify_referential_integrity  # noqa: F401
from .sample import hash_percent_filter, systematic_percent  # noqa: F401
