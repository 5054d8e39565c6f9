"""Porter2 (Snowball English) stemmer — from-scratch implementation of
the published algorithm (snowballstem.org/algorithms/english/stemmer).

The reference stems via org.tartarus.snowball.ext.EnglishStemmer
(SmaphUtils.stemString, SmaphUtils.java:323-335), which IS Porter2;
this module re-implements the public specification (no code consulted
or copied), giving the fragmentation/aggregation features (X11/A7) the
reference's real equivalence classes instead of round 1's light
suffix-stripper.
"""

from __future__ import annotations

VOWELS = frozenset("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTIONS_1A = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in VOWELS


def _regions(word: str) -> tuple[int, int]:
    """(R1, R2) start offsets per the spec; special prefixes gener-,
    commun-, arsen- pin R1 after the prefix."""
    r1 = len(word)
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, len(word)):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _short_syllable_at(word: str, i: int) -> bool:
    """Short syllable ending at index i (inclusive): either (a) vowel at
    position 0 followed by non-vowel, or (b) non-vowel, vowel, non-vowel
    (the last not w/x/Y)."""
    if i == 1 and len(word) >= 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if i >= 2:
        return (
            not _is_vowel(word, i - 2)
            and _is_vowel(word, i - 1)
            and not _is_vowel(word, i)
            and word[i] not in "wxY"
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _short_syllable_at(word, len(word) - 1)


def _contains_vowel(word: str, start: int, end: int) -> bool:
    return any(word[i] in VOWELS for i in range(start, end))


def stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    if w.startswith("'"):
        w = w[1:]
    if w in _EXCEPTIONS:
        return _EXCEPTIONS[w]
    # mark consonant y as Y
    if w.startswith("y"):
        w = "Y" + w[1:]
    w = "".join(
        "Y" if c == "y" and i > 0 and w[i - 1] in VOWELS else c
        for i, c in enumerate(w)
    )
    r1, r2 = _regions(w)

    # step 0 — strip apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if _contains_vowel(w, 0, len(w) - 2):
            w = w[:-1]

    if w in _EXCEPTIONS_1A:
        return w.replace("Y", "y")

    # step 1b
    if w.endswith(("eed", "eedly")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if len(w) - len(suf) >= r1:
            w = w[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stemv = w[: -len(suf)]
                if _contains_vowel(stemv, 0, len(stemv)):
                    w = stemv
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(DOUBLES):
                        w = w[:-1]
                    elif _is_short(w, r1):
                        w += "e"
                break

    # step 1c — y/Y -> i when preceded by a non-vowel that isn't first
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2] not in VOWELS
    ):
        w = w[:-1] + "i"

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    # step 2 (longest suffix, only if in R1)
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", "og"), ("li", ""),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if in_r1(suf):
                if suf == "ogi":
                    if len(w) > 3 and w[-4] == "l":
                        w = w[:-3] + rep
                elif suf == "li":
                    if len(w) > 2 and w[-3] in LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 3 (in R1; ative needs R2)
    step3 = [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if in_r1(suf):
                if suf == "ative":
                    if in_r2(suf):
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 4 (in R2)
    step4 = [
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "al", "er", "ic",
    ]
    for suf in step4:
        if w.endswith(suf):
            if in_r2(suf):
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if in_r2("e") or (
            in_r1("e") and not _short_syllable_at(w[:-1], len(w) - 2)
        ):
            w = w[:-1]
    elif w.endswith("l") and in_r2("l") and len(w) > 1 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")
