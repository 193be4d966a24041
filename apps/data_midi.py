"""Thin shim mapping the reference entry point `data_midi` to `rlmg data-midi`."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from reinforcement_learning_in_music_generation_tpu.apps.cli import main

if __name__ == "__main__":
    main(["data-midi"] + sys.argv[1:])
