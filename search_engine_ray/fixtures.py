"""Deterministic synthetic fixtures (seed=42) per FIXTURES.md.

F1 ``pages`` table: (url, warc_ts, html, text, lang) with a token mix that
exercises every parser special case from SURVEY.md §2.2.  F2 ``tweets``
mirrors the reference sample schema.  F3 queries.  No external data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from search_engine_ray.text.extract import wrap_html

_BASE_TS_US = 1595808000_000_000  # 2020-07-27T00:00:00Z, microseconds

# head of the zipf vocabulary: stopword-adjacent head terms so skew matches
# the reference sample index (term 'rt' df=706/1000; BASELINE.md)
_HEAD_WORDS = [
    "rt", "the", "is", "and", "to", "of", "virus", "covid", "news", "people",
    "pandemic", "world", "health", "home", "work", "time", "day", "today",
    "masks", "vaccine",
]

_ENTITIES_COMMON = ["Donald Trump", "South Korea", "New York", "World Health"]
_ALWAYS_CAPS = ["NASA", "Reuters", "Pfizer"]   # never appear lowercase -> UPPER rewrite
_MIXED_CAPS = "apple"                          # appears both cased -> stays lower
_HASHTAGS = ["#CovidIsReal", "#StayHome", "#Breaking2020"]
_MENTIONS = ["@user123", "@who", "@cdcgov"]
_NUMBERS = ["2", "68,800", "123,456,678", "3.5 billion", "50%", "35 percent",
            "3-4%", "50k", "3M", "7 thousand"]
_FRACTIONS = ["3/4", "-5\\8", "3 1/2"]
_DASHED = ["well-being", "COVID-19", "long-term"]
_URLS = [
    "https://www.instagram.com/p/ABC123/?x=y",
    "https://t.co/abc123",
    "https://example.org/page/77",
]
_NON_LATIN_BITS = ["中", "ω", "€", "Привет"]


def _zipf_vocab(size: int = 5000) -> list[str]:
    return _HEAD_WORDS + [f"w{i}" for i in range(size - len(_HEAD_WORDS))]


def _zipf_probs(size: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def gen_pages(n: int, seed: int = 42, min_len: int = 8,
              max_len: int = 28, start: int = 0) -> pa.Table:
    """F1 pages table; deterministic in (n, seed, lengths, start).

    Default lengths are tweet-like (reference avg 21.5 terms/doc,
    BASELINE.md); pass e.g. min_len=150/max_len=350 for Common-Crawl-like
    page bodies (bench corpus).  ``start`` offsets every per-doc IDENTITY
    (url, timestamp, title, once-only entities) so multi-file corpora
    generated in slices hold DISTINCT documents — without it two slices
    repeat the same urls and their doc_ids (url hashes) collide."""
    rng = np.random.default_rng(seed)
    vocab = _zipf_vocab()
    probs = _zipf_probs(len(vocab))
    lengths = rng.integers(min_len, max_len, size=n)
    base_idx = rng.choice(len(vocab), size=int(lengths.sum()), p=probs)
    r = rng.random(size=(n, 12))  # decision rolls per doc

    urls, tss, htmls, texts, langs = [], [], [], [], []
    pos = 0
    for i in range(n):
        L = int(lengths[i])
        words = [vocab[j] for j in base_idx[pos:pos + L]]
        pos += L
        # sprinkle special shapes deterministically
        if r[i, 0] < 0.30:
            ent = _ENTITIES_COMMON[i % len(_ENTITIES_COMMON)]
            # ~1/3 lowercase so these words aren't ALL-caps-rewritten and
            # stay reachable by lowercase queries (capitals-AND -> False)
            words.insert(L // 2, ent.lower() if r[i, 0] < 0.10 else ent)
        if r[i, 1] < 0.05:
            words.insert(0, f"Unique{start + i} Entity{start + i} thing")  # once-only entity
        if r[i, 2] < 0.20:
            words.append(_ALWAYS_CAPS[i % len(_ALWAYS_CAPS)])
        if r[i, 3] < 0.20:
            words.append(_MIXED_CAPS if r[i, 3] < 0.10 else _MIXED_CAPS.capitalize())
        if r[i, 4] < 0.25:
            words.append(_HASHTAGS[i % len(_HASHTAGS)])
        if r[i, 5] < 0.20:
            words.append(_MENTIONS[i % len(_MENTIONS)])
        if r[i, 6] < 0.35:
            words.append(_NUMBERS[i % len(_NUMBERS)])
        if r[i, 7] < 0.15:
            words.append(_FRACTIONS[i % len(_FRACTIONS)])
        if r[i, 8] < 0.20:
            words.append(_DASHED[i % len(_DASHED)])
        if r[i, 9] < 0.15:
            words.insert(max(0, L // 3), _URLS[i % len(_URLS)])
        if r[i, 10] < 0.05:
            words.append(_NON_LATIN_BITS[i % len(_NON_LATIN_BITS)])
        if r[i, 11] < 0.03:
            words.append(f"hapax{start + i}")  # df==1 prune candidates

        text = " ".join(words)
        g = start + i
        category = ["news", "blog", "wiki", "forum"][g % 4]
        url = f"https://site{g % 97}.example/{category}/{g:08d}"
        urls.append(url)
        tss.append(_BASE_TS_US + g * 7_000_000)
        texts.append(text)
        htmls.append(wrap_html(text, f"t{g}"))
        langs.append("en" if g % 20 != 7 else ["es", "de", "fr"][g % 3])

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def gen_queries() -> list[str]:
    """F3 query fixture: exercises min-match, unknown terms, stopword-only,
    number/hashtag forms, and score ties."""
    return [
        "covid",
        "virus",
        "rt",                      # head term (also a stopword -> empty query)
        "covid vaccine news",
        "Donald Trump",
        "south korea travel",
        "the and of",              # stopword-only
        "zzzunknownzzz",           # absent from index
        "covid zzzunknownzzz vaccine",
        "#CovidIsReal",
        "68,800",
        "3.5 billion people",
        "50% masks",
        "well-being at work",
        "NASA",                    # UPPER-rewritten term, unreachable lowercase
        "nasa",
        "apple health",
        "world health organization",
        "3/4 time",
        "@user123",
        "masks masks masks",       # repeated query term
        "pandemic world health home work",
        "50k people",
        "news today",
        "vaccine",
    ]


def gen_tweets(n: int, seed: int = 43) -> pa.Table:
    """F2 tweets table (reference sample shape: 8 string columns,
    /root/reference/sample.parquet)."""
    import json

    pages = gen_pages(n, seed=seed)
    texts = pages.column("text").to_pylist()
    days = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
    rows = {k: [] for k in ["tweet_id", "tweet_date", "full_text", "url",
                            "retweet_text", "retweet_url", "quote_text",
                            "quote_url"]}
    for i in range(n):
        rows["tweet_id"].append(str(1288_000_000_000_000_000 + i))
        day = days[i % 7]
        rows["tweet_date"].append(f"{day} Jul {27 + (i % 3):02d} "
                                  f"{i % 24:02d}:{i % 60:02d}:{(i * 7) % 60:02d} +0000 2020")
        rows["full_text"].append(texts[i])
        rows["url"].append(json.dumps({"short": _URLS[i % len(_URLS)]})
                           if i % 3 == 0 else "{}")
        rows["retweet_text"].append("")
        rows["retweet_url"].append("{}")
        rows["quote_text"].append("quoted text here" if i % 5 == 0 else None)
        rows["quote_url"].append("{}")
    return pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})


def gen_tweets_wide(n: int, seed: int = 44) -> pa.Table:
    """F2b: the reference's FULL-corpus 13-column positional shape
    (parser_module.py:110-141): url dicts at positions 3/6/9/12 and
    quote_text at position 8 — the layout where URL harvesting and the
    quote-text concat (parser.py:177-178) actually fire.  The bundled
    8-column sample shape (``gen_tweets``) never reaches index 8, so
    this variant is the only coverage of those paths."""
    import json

    pages = gen_pages(n, seed=seed)
    texts = pages.column("text").to_pylist()
    days = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
    cols = ["tweet_id", "tweet_date", "full_text", "url", "c4", "c5",
            "retweet_url", "c7", "quote_text", "quote_url", "c10",
            "c11", "retweet_quoted_url"]
    rows: dict[str, list] = {k: [] for k in cols}
    for i in range(n):
        rows["tweet_id"].append(str(1289_000_000_000_000_000 + i))
        day = days[i % 7]
        rows["tweet_date"].append(
            f"{day} Jul {27 + (i % 3):02d} {i % 24:02d}:{i % 60:02d}:"
            f"{(i * 7) % 60:02d} +0000 2020")
        rows["full_text"].append(texts[i])
        rows["url"].append(json.dumps({"short": _URLS[i % len(_URLS)]})
                           if i % 3 == 0 else "{}")
        rows["c4"].append("")
        rows["c5"].append("")
        rows["retweet_url"].append(
            json.dumps({"s": _URLS[(i + 1) % len(_URLS)]})
            if i % 4 == 0 else "{}")
        rows["c7"].append("")
        rows["quote_text"].append(f"quoted passage {i % 7}"
                                  if i % 5 == 0 else None)
        rows["quote_url"].append(
            json.dumps({"q": _URLS[(i + 2) % len(_URLS)]})
            if i % 6 == 0 else "{}")
        rows["c10"].append("")
        rows["c11"].append("")
        rows["retweet_quoted_url"].append(
            json.dumps({"r": _URLS[(i + 3) % len(_URLS)]})
            if i % 7 == 0 else "{}")
    return pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})
