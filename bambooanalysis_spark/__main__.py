"""``python -m bambooanalysis_spark run <analysis> <catalog.yml> -o out/``
— the bambooRun-style CLI (reference README.md:63-75)."""

import sys

from .driver import main

if __name__ == "__main__":
    sys.exit(main())
