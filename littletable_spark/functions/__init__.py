from .rows import to_row_dict
from .normalize import normalize_words, STOPWORDS
