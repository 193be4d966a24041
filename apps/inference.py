"""Thin shim mapping the reference entry point `inference` to `cli.py inference`."""
import sys
from cli import main

if __name__ == "__main__":
    main(["inference"] + sys.argv[1:])
