"""Reference-named launcher shims (README.md:30-50).  Not an installed
package — the real CLI is reinforcement_learning_in_music_generation_tpu/
apps/cli.py, console script `rlmg`."""
