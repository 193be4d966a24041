"""Thin shim mapping the reference entry point `discrim_pretrain` to `cli.py discrim-pretrain`."""
import sys
from cli import main

if __name__ == "__main__":
    main(["discrim-pretrain"] + sys.argv[1:])
