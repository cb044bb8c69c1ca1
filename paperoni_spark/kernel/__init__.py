from .extractor import Article
from .readability import MetaData, Readability, ReadabilityError

__all__ = ["Article", "MetaData", "Readability", "ReadabilityError"]
