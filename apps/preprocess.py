"""Thin shim mapping the reference entry point `preprocess` to `cli.py preprocess`."""
import sys
from cli import main

if __name__ == "__main__":
    main(["preprocess"] + sys.argv[1:])
