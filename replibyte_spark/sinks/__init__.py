from .datastore import Datastore, DumpInfo  # noqa: F401
