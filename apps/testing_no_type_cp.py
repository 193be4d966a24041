"""Thin shim mapping the reference entry point `testing_no_type_cp` to `cli.py generate`."""
import sys
from cli import main

if __name__ == "__main__":
    main(["generate"] + sys.argv[1:])
