"""Porter2 (Snowball English) stemmer — pure-Python implementation of
the published algorithm (snowballstem.org "The English (Porter2)
stemming algorithm"). The reference runs Snowball per locale inside its
``text`` analyzer (``core/analysis/text_token_stream.cpp:356-414``,
via libstemmer); no stemming library exists in this environment, so the
algorithm is implemented directly.

Only the English stemmer is provided; other locales fall back to the
light suffix stripper in ``TextAnalyzer`` (documented divergence).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_END = frozenset("cdeghkmnrt")

_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTION2 = frozenset([
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
])

_STEP2_SUFFIXES = [
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"),
]

_STEP3_SUFFIXES = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ful", ""), ("ness", ""),
]

_STEP4_SUFFIXES = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
]


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _regions(word: str) -> tuple[int, int]:
    """(R1 start, R2 start) per the algorithm (with the gener-/commun-/
    arsen- special cases for R1)."""
    n = len(word)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable: non-vowel + vowel +
    non-vowel(not w/x/Y), or vowel + non-vowel at position 0/1."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        c = word[n - 1]
        return (not _is_vowel(word, n - 1) and c not in "wxY"
                and _is_vowel(word, n - 2) and not _is_vowel(word, n - 3))
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _has_vowel(word: str, end: int) -> bool:
    return any(word[i] in _VOWELS for i in range(end))


def stem(word: str) -> str:
    """Stem one lowercase word (non-ASCII letters pass through the
    vowel test as consonants, matching Snowball's behavior on its own
    alphabet)."""
    if len(word) <= 2:
        return word
    exc = _EXCEPTION1.get(word)
    if exc is not None:
        return exc
    w = word
    if w[0] == "'":
        w = w[1:]
    # mark consonant-y as Y
    if w.startswith("y"):
        w = "Y" + w[1:]
    w = "".join(
        "Y" if c == "y" and i > 0 and w[i - 1] in _VOWELS else c
        for i, c in enumerate(w)
    )
    r1, r2 = _regions(w)

    # step 0: 's / 's' / '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        if _has_vowel(w, len(w) - 2):
            w = w[:-1]

    if w in _EXCEPTION2:
        return w.lower()

    # step 1b
    ed_like = None
    for suf in ("eedly", "ingly", "edly", "ing", "eed", "ed"):
        if w.endswith(suf):
            ed_like = suf
            break
    if ed_like in ("eed", "eedly"):
        if len(w) - len(ed_like) >= r1:
            w = w[: len(w) - len(ed_like)] + "ee"
    elif ed_like is not None:
        stem_part = w[: len(w) - len(ed_like)]
        if _has_vowel(stem_part, len(stem_part)):
            w = stem_part
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif w.endswith(_DOUBLES):
                w = w[:-1]
            elif _is_short(w, r1):
                w = w + "e"

    # step 1c: y -> i after a consonant that is not the first letter
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _VOWELS:
        w = w[:-1] + "i"

    # step 2 (in R1)
    for suf, rep in _STEP2_SUFFIXES:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: len(w) - len(suf)] + rep
            break
    else:
        if w.endswith("ogi"):
            if len(w) - 3 >= r1 and len(w) >= 4 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if len(w) - 2 >= r1 and len(w) >= 3 and w[-3] in _LI_END:
                w = w[:-2]

    # step 3 (in R1; ative needs R2)
    if w.endswith("ative"):
        if len(w) - 5 >= r1 and len(w) - 5 >= r2:
            w = w[:-5]
    else:
        for suf, rep in _STEP3_SUFFIXES:
            if w.endswith(suf):
                if len(w) - len(suf) >= r1:
                    w = w[: len(w) - len(suf)] + rep
                break

    # step 4 (in R2)
    for suf in _STEP4_SUFFIXES:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: len(w) - len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2:
            w = w[:-1]
        elif len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1]):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
            w = w[:-1]

    return w.lower()
