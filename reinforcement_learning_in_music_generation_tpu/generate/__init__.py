from .sampler import CP_SEED, GenResult, generate_songs, generate_tokens

__all__ = ["CP_SEED", "GenResult", "generate_songs", "generate_tokens"]
