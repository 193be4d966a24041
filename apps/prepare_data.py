"""Thin shim mapping the reference entry point `prepare_data` to `rlmg prepare-data`."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from reinforcement_learning_in_music_generation_tpu.apps.cli import main

if __name__ == "__main__":
    main(["prepare-data"] + sys.argv[1:])
