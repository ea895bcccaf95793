from .reference_oracle import KeywordOracle, BertOracle

__all__ = ["KeywordOracle", "BertOracle"]
