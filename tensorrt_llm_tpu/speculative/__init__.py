from .interface import SpeculativeDecodingMode, Drafter  # noqa: F401
from .ngram import NGramDrafter  # noqa: F401
