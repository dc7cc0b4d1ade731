from .jsexpr import compile_js  # noqa: F401
from .text import minhash_signature, rolling_fingerprint, simhash64  # noqa: F401
