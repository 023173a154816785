from .text import clean_word, tokenize

__all__ = ["clean_word", "tokenize"]
