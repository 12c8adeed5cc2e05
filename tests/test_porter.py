from hypothesis import given, strategies as st

from lucene_ray.functions.porter import porter_stem

# Golden vectors from the published algorithm description / reference
# vocabulary (martin porter's voc.txt -> output.txt), including the
# FIXTURES.md "Porter-interesting" words.
GOLDENS = {
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "happy": "happi",
    "sky": "sky",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "hesitanci": "hesit",
    "digitizer": "digit",
    "conformabli": "conform",
    "radicalli": "radic",
    "differentli": "differ",
    "vileli": "vile",
    "analogousli": "analog",
    "vietnamization": "vietnam",
    "predication": "predic",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "homologou": "homolog",
    "communism": "commun",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
    # logi -> log departure
    "archaeology": "archaeolog",
    "analogies": "analog",
}


def test_goldens():
    bad = {w: (porter_stem(w), want) for w, want in GOLDENS.items()
           if porter_stem(w) != want}
    assert not bad, f"porter mismatches: {bad}"


def test_short_words_unchanged():
    for w in ("a", "is", "be", "ox"):
        assert porter_stem(w) == w


@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122),
               min_size=0, max_size=30))
def test_never_crashes_and_never_grows_much(w):
    s = porter_stem(w)
    assert isinstance(s, str)
    assert len(s) <= len(w) + 1  # at most one char appended (e -> ate/ble/ize)


@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122),
               min_size=3, max_size=30))
def test_idempotent_on_typical_words(w):
    # Porter is not formally idempotent, but stem(stem(w)) must not crash
    porter_stem(porter_stem(w))
