from .tokenizer import (  # noqa: F401
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    StandardAnalyzer,
    standard_tokenize,
)
from .cjk import CJKAnalyzer  # noqa: F401
