"""Thin shim mapping the reference entry point `ppo_train` to `cli.py ppo-train`."""
import sys
from cli import main

if __name__ == "__main__":
    main(["ppo-train"] + sys.argv[1:])
