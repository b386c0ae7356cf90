from .text import normalize_token, tokenize, tokens_df
