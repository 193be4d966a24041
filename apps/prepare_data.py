"""Thin shim mapping the reference entry point `prepare_data` to `cli.py prepare-data`."""
import sys
from cli import main

if __name__ == "__main__":
    main(["prepare-data"] + sys.argv[1:])
