"""Thin shim mapping the reference entry point `IRL_dqn_train` to `cli.py dqn-train`."""
import sys
from cli import main

if __name__ == "__main__":
    main(["dqn-train"] + sys.argv[1:])
