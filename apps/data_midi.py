"""Thin shim mapping the reference entry point `data_midi` to `cli.py data-midi`."""
import sys
from cli import main

if __name__ == "__main__":
    main(["data-midi"] + sys.argv[1:])
