"""Porter2 stemmer spot checks against publicly documented outputs."""

from search_engine_ray.text.stemmer import stem

KNOWN = {
    # snowball spec examples / widely documented porter2 outputs
    "ties": "tie", "cries": "cri", "dying": "die", "lying": "lie",
    "skies": "sky", "early": "earli", "only": "onli", "news": "news",
    "sky": "sky", "proceed": "proceed", "inning": "inning",
    "running": "run", "plotted": "plot", "hopping": "hop",
    "hoping": "hope", "happily": "happili", "meeting": "meet",
    "agreed": "agre", "caresses": "caress", "ponies": "poni",
    "nationally": "nation", "rational": "ration",
    "generously": "generous", "generate": "generat",
    "conditional": "condit", "itemization": "item",
    "sensational": "sensat", "reference": "refer",
    "colonizer": "colon", "hopefulness": "hope",
    "a": "a", "be": "be", "on": "on",
}


def test_known_stems():
    bad = {w: (e, stem(w)) for w, e in KNOWN.items() if stem(w) != e}
    assert not bad, bad


def test_lowercases_like_nltk():
    assert stem("Running") == "run"
    assert stem("NASA") == "nasa"


def test_idempotent_on_short():
    assert stem("x") == "x"
    assert stem("xy") == "xy"


def test_consecutive_y_marking_matches_nltk():
    """'sayyid': the second y's predecessor is the REWRITTEN 'Y' (not a
    vowel), so it must stay unmarked — NLTK rewrites in place."""
    from search_engine_ray.text.stemmer import stem

    # NLTK SnowballStemmer('english').stem('sayyid') == 'sayyid'
    assert stem("sayyid") == "sayyid"
    # regression guards around the y-marking path
    assert stem("saying") == "say"
    assert stem("playing") == "play"


def test_curly_apostrophe_possessive_strips():
    """U+2019 normalizes to ASCII before Step 0, so curly possessives
    strip like NLTK's."""
    from search_engine_ray.text.stemmer import stem

    assert stem("world’s") == stem("world's") == "world"
