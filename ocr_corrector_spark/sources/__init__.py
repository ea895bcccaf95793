from .transcripts import CORPUS, gen_transcripts
from .tables import load_tables

__all__ = ["CORPUS", "gen_transcripts", "load_tables"]
