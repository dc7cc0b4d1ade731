from .text import minhash_signature, rolling_fingerprint, simhash64  # noqa: F401
