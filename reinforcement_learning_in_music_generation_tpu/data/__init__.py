from . import chords, dataset, events, midifile, tokenizer

__all__ = ["chords", "dataset", "events", "midifile", "tokenizer"]
