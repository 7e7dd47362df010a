"""Frozen stopword list.

The reference builds its stopword dict from ``nltk.corpus.stopwords
.words('english')`` plus an extension list of twitter/punctuation tokens
(/root/reference/parser_module.py:14-20).  nltk is not available in this
environment and a runtime download would be non-deterministic, so we ship a
frozen snapshot of the well-known public NLTK English stopword list (179
words) and reproduce the reference's extension list verbatim in behavior.
"""

from __future__ import annotations

# The public NLTK English stopword list (nltk_data corpora/stopwords/english).
NLTK_ENGLISH_STOPWORDS = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are", "was",
    "were", "be", "been", "being", "have", "has", "had", "having", "do",
    "does", "did", "doing", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've", "now",
    "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't",
    "couldn", "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn",
    "hadn't", "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't", "shan",
    "shan't", "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't",
    "won", "won't", "wouldn", "wouldn't",
]

# Reference extension list, reproduced with the same effective members
# (/root/reference/parser_module.py:15-19).  Note the reference list
# contains the implicit string concatenation "'}' \"'&'\"" -> "}'&'" and
# raw-string artifacts (r'n\'t' == "n\\'t"); we reproduce the *effective*
# set of keys its dict.fromkeys() produced.
REFERENCE_EXTENSION = [
    "rt", "“", "’", "n\\'t", "n't", "'s", "\\'s", "\\'ve",
    "\\'m", "...", "\\'\\'", "\\'d", "&", "\\'ll", "\\'re",
    " ", "", "''", '""', '"', "”", "‘", "``", "'", "`",
    "!", "?", ",", ":", ";", "(", ")", "[", "]", "{", "}'&'", ".",
    "-", "--",
]

STOPWORDS: frozenset[str] = frozenset(NLTK_ENGLISH_STOPWORDS) | frozenset(
    REFERENCE_EXTENSION
)


def is_stopword(token_lower: str) -> bool:
    return token_lower in STOPWORDS
