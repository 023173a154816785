from .tables import TABLES, load_table, register_views
from .text import read_tokens, tokens_from_lines

__all__ = ["TABLES", "load_table", "register_views", "read_tokens", "tokens_from_lines"]
