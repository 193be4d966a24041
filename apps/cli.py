"""Source-checkout shim: the CLI lives in the package
(reinforcement_learning_in_music_generation_tpu/apps/cli.py, installed as
the `rlmg` console script); this keeps `python apps/cli.py ...` working."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from reinforcement_learning_in_music_generation_tpu.apps.cli import main

if __name__ == "__main__":
    main()
