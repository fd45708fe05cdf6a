"""``python -m ics_tpu`` — the command-line interface (see ics_tpu/cli.py;
the installed console script ``ics-tpu`` is the same entry point)."""

import sys

from ics_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
