"""Thin shim mapping the reference entry point `my_pretrain` to `cli.py my-pretrain`."""
import sys
from cli import main

if __name__ == "__main__":
    main(["my-pretrain"] + sys.argv[1:])
