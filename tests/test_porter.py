"""Porter stemmer unit tests — canonical examples from the published
algorithm (Porter 1980) exercising every rule step."""

import pytest

from research_engine_spark.functions.porter import CachedStemmer, stem

CASES = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat",
    # step 1b (+ cleanup)
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas", "controll": "control",
    "roll": "roll",
    # engine-relevant vocabulary (query-set terms)
    "networks": "network", "neural": "neural", "transformer": "transform",
    "architectures": "architectur", "learning": "learn", "models": "model",
    "processing": "process", "attention": "attent", "retrieval": "retriev",
    "machine": "machin",
}


@pytest.mark.parametrize("word,expected", sorted(CASES.items()))
def test_stem(word, expected):
    assert stem(word) == expected


def test_short_words_unchanged():
    for w in ["a", "is", "be", "on", ""]:
        assert stem(w) == w


def test_cached_stemmer_matches_plain():
    cs = CachedStemmer()
    for w in CASES:
        assert cs(w) == stem(w)
        assert cs(w) == stem(w)  # cached path
