"""Thin shim mapping the reference entry point `my_pretrain` to `rlmg my-pretrain`."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from reinforcement_learning_in_music_generation_tpu.apps.cli import main

if __name__ == "__main__":
    main(["my-pretrain"] + sys.argv[1:])
