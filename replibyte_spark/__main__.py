"""`python -m replibyte_spark` — see cli.py for the command tree."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
