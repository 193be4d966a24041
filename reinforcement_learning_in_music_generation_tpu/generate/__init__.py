from .sampler import CP_SEED, GenResult, generate_songs, generate_tokens
from .serving import ServeResult, generate_songs_continuous, serve_requests

__all__ = [
    "CP_SEED", "GenResult", "generate_songs", "generate_tokens",
    "ServeResult", "generate_songs_continuous", "serve_requests",
]
