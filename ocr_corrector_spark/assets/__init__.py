"""Static dictionary assets.

These are the broadcast-sized side inputs of the engine (SURVEY.md §1):
keyword dictionary, char-meta glyph decompositions, the traditional-char
rejection set, and the deterministic masked-LM stand-in scorer table.
All are data (not code) and are documented against the reference files
they parallel.
"""

from .keywords import KEYWORDS
from .char_meta import build_char_meta
from .scorer_table import SCORER_TABLE, DEFAULT_TOPN

__all__ = ["KEYWORDS", "build_char_meta", "SCORER_TABLE", "DEFAULT_TOPN"]
