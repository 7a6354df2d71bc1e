"""Pure-Python Snowball stemmers for non-English locales.

The reference runs libstemmer's Snowball algorithms per locale inside
the ``text`` analyzer (``core/analysis/text_token_stream.cpp:356-414``);
no stemming library ships in this environment, so the published
algorithms (snowballstem.org) are implemented directly. Each stemmer is
a plain ``str -> str`` on a single lower-cased token; the analyzer
dictionary-encodes per batch so each distinct token stems once.

Implemented: de, da, no, sv, es, fr, it, pt, nl, ru, fi (+ en
delegating to porter2).
``get_stemmer(lang)`` raises KeyError for unsupported locales so the
caller can fall back to no stemming (documented divergence).
"""

from __future__ import annotations


def _regions(word: str, vowels: str) -> tuple[int, int]:
    """Standard R1/R2: the region after the first non-vowel following a
    vowel, and the same definition applied again within R1."""
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r2 = i + 1
            break
    return r1, r2


def _longest_suffix(word: str, suffixes) -> str | None:
    """Longest member of ``suffixes`` that ends ``word`` (snowball
    'among' semantics: the longest match selects the branch even if its
    condition later fails)."""
    best = None
    for s in suffixes:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


# ---------------------------------------------------------------------------
# German
# ---------------------------------------------------------------------------

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"
_DE_STEP1 = ("ern", "em", "er", "en", "es", "e", "s")
_DE_STEP2 = ("est", "er", "en", "st")
_DE_STEP3 = ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik")


def stem_de(word: str) -> str:
    word = word.replace("ß", "ss")
    if len(word) > 2:
        ch = list(word)
        for i in range(1, len(ch) - 1):
            if ch[i] in "uy" and ch[i - 1] in _DE_VOWELS \
                    and ch[i + 1] in _DE_VOWELS:
                ch[i] = ch[i].upper()
        word = "".join(ch)
    r1, r2 = _regions(word, _DE_VOWELS)
    r1 = max(r1, 3)  # amended: at least 3 letters before R1

    def in_r1(s):
        return len(word) - len(s) >= r1

    def in_r2(s):
        return len(word) - len(s) >= r2

    # step 1
    suf = _longest_suffix(word, _DE_STEP1)
    if suf:
        if suf == "s":
            if in_r1(suf) and len(word) >= 2 and word[-2] in _DE_S_END:
                word = word[:-1]
        elif in_r1(suf):
            word = word[: -len(suf)]
            if suf in ("en", "es", "e") and word.endswith("niss"):
                word = word[:-1]
    # step 2
    suf = _longest_suffix(word, _DE_STEP2)
    if suf:
        if suf == "st":
            if in_r1(suf) and len(word) >= 6 and word[-3] in _DE_ST_END:
                word = word[:-2]
        elif in_r1(suf):
            word = word[: -len(suf)]
    # step 3 (d-suffixes)
    suf = _longest_suffix(word, _DE_STEP3)
    if suf:
        if suf in ("end", "ung"):
            if in_r2(suf):
                word = word[: -len(suf)]
                if word.endswith("ig") and not word.endswith("eig") \
                        and len(word) - 2 >= r2:
                    word = word[:-2]
        elif suf in ("ig", "ik", "isch"):
            if in_r2(suf) and not word.endswith("e" + suf):
                word = word[: -len(suf)]
        elif suf in ("lich", "heit"):
            if in_r2(suf):
                word = word[: -len(suf)]
                for pre in ("er", "en"):
                    if word.endswith(pre) and len(word) - 2 >= r1:
                        word = word[:-2]
                        break
        elif suf == "keit":
            if in_r2(suf):
                word = word[: -len(suf)]
                for pre in ("lich", "ig"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
    return (word.replace("U", "u").replace("Y", "y")
            .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ---------------------------------------------------------------------------
# Danish
# ---------------------------------------------------------------------------

_DA_VOWELS = "aeiouyæåø"
_DA_S_END = "abcdfghjklmnoprtvyzå"
_DA_STEP1 = (
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ered", "ende", "erne", "eren",
    "erer", "heds", "enes", "eres", "eret", "hed", "ene", "ere", "ens",
    "ers", "ets", "en", "er", "es", "et", "e", "s",
)


def _scand_r1(word: str, vowels: str) -> int:
    r1, _ = _regions(word, vowels)
    return max(r1, 3)


def stem_da(word: str) -> str:
    r1 = _scand_r1(word, _DA_VOWELS)

    def in_r1(s):
        return len(word) - len(s) >= r1

    suf = _longest_suffix(word, _DA_STEP1)
    if suf:
        if suf == "s":
            if in_r1(suf) and len(word) >= 2 and word[-2] in _DA_S_END:
                word = word[:-1]
        elif in_r1(suf):
            word = word[: -len(suf)]

    def step2(w):
        for s in ("gd", "dt", "gt", "kt"):
            if w.endswith(s) and len(w) - len(s) >= r1 - (len(s) - 1):
                # the final letter removed must be in R1
                if len(w) - 1 >= r1:
                    return w[:-1]
        return w

    word = step2(word)
    # step 3
    if word.endswith("igst"):
        word = word[:-2]
    suf = _longest_suffix(word, ("elig", "løst", "lig", "els", "ig"))
    if suf:
        if suf == "løst":
            if len(word) - 1 >= r1:
                word = word[:-1]  # løst -> løs
        elif in_r1(suf):
            word = word[: -len(suf)]
            word = step2(word)
    # step 4: undouble
    if len(word) >= 2 and word[-1] == word[-2] \
            and word[-1] not in _DA_VOWELS and len(word) - 1 >= r1:
        word = word[:-1]
    return word


# ---------------------------------------------------------------------------
# Norwegian
# ---------------------------------------------------------------------------

_NO_VOWELS = "aeiouyæåø"
_NO_S_END = "bcdfghjlmnoprtvyz"
_NO_STEP1 = (
    "hetenes", "hetene", "hetens", "heten", "heter", "endes", "enes",
    "edes", "erte", "ande", "ende", "ane", "ene", "ens", "ers", "ets",
    "het", "ast", "ert", "ede", "ar", "er", "as", "es", "et", "en",
    "a", "e", "s",
)


def stem_no(word: str) -> str:
    r1 = _scand_r1(word, _NO_VOWELS)

    def in_r1(s):
        return len(word) - len(s) >= r1

    suf = _longest_suffix(word, _NO_STEP1)
    if suf:
        if suf == "s":
            ok = len(word) >= 2 and (
                word[-2] in _NO_S_END
                or (word[-2] == "k" and (len(word) < 3
                                         or word[-3] not in _NO_VOWELS)))
            if in_r1(suf) and ok:
                word = word[:-1]
        elif suf in ("erte", "ert"):
            if in_r1(suf):
                word = word[: -len(suf)] + "er"
        elif in_r1(suf):
            word = word[: -len(suf)]
    # step 2
    for s in ("dt", "vt"):
        if word.endswith(s) and len(word) - 1 >= r1:
            word = word[:-1]
            break
    # step 3
    suf = _longest_suffix(word, ("hetslov", "eleg", "elov", "slov",
                                 "elig", "leg", "eig", "lig", "els",
                                 "lov", "ig"))
    if suf and len(word) - len(suf) >= r1:
        word = word[: -len(suf)]
    return word


# ---------------------------------------------------------------------------
# Swedish
# ---------------------------------------------------------------------------

_SV_VOWELS = "aeiouyäåö"
_SV_S_END = "bcdfghjklmnoprtvy"
_SV_STEP1 = (
    "heterna", "hetens", "arnas", "ernas", "ornas", "heten", "heter",
    "anden", "arens", "andet", "arna", "erna", "orna", "ande", "arne",
    "aste", "aren", "ades", "erns", "ade", "are", "ern", "ens", "het",
    "ast", "ad", "en", "ar", "er", "or", "as", "es", "at", "a", "e",
    "s",
)


def stem_sv(word: str) -> str:
    r1 = _scand_r1(word, _SV_VOWELS)

    def in_r1(s):
        return len(word) - len(s) >= r1

    suf = _longest_suffix(word, _SV_STEP1)
    if suf:
        if suf == "s":
            if in_r1(suf) and len(word) >= 2 and word[-2] in _SV_S_END:
                word = word[:-1]
        elif in_r1(suf):
            word = word[: -len(suf)]
    for s in ("dd", "gd", "nn", "dt", "gt", "kt", "tt"):
        if word.endswith(s) and len(word) - 1 >= r1:
            word = word[:-1]
            break
    suf = _longest_suffix(word, ("fullt", "löst", "lig", "els", "ig"))
    if suf:
        if suf == "fullt":
            if len(word) - 1 >= r1:
                word = word[:-1]
        elif suf == "löst":
            if len(word) - 1 >= r1:
                word = word[:-1]
        elif in_r1(suf):
            word = word[: -len(suf)]
    return word


# ---------------------------------------------------------------------------
# Spanish
# ---------------------------------------------------------------------------

_ES_VOWELS = "aeiouáéíóúü"


def _es_rv(word: str) -> int:
    n = len(word)
    if n < 3:
        return n
    if word[1] not in _ES_VOWELS:
        # next vowel after position 1
        for i in range(2, n):
            if word[i] in _ES_VOWELS:
                return i + 1
        return n
    if word[0] in _ES_VOWELS and word[1] in _ES_VOWELS:
        for i in range(2, n):
            if word[i] not in _ES_VOWELS:
                return i + 1
        return n
    return 3


_ES_PRON = ("selas", "selos", "sela", "selo", "las", "les", "los",
            "nos", "me", "se", "la", "le", "lo")
_ES_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_PRE_B = ("iendo", "ando", "ar", "er", "ir")
_ES_DEACCENT = str.maketrans("áéíóú", "aeiou")

_ES_STEP1_DEL_R2 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
    "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
    "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa",
)
_ES_STEP1_ADOR = ("aciones", "adoras", "adores", "ancias", "adora",
                  "ación", "antes", "ancia", "ador", "ante")
_ES_STEP1_IVA = ("ivas", "ivos", "iva", "ivo")
_ES_STEP2B_LONG = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aremos", "eríais", "eremos", "iríais", "iremos", "ierais",
    "ieseis", "asteis", "isteis", "ábamos", "áramos", "ásemos",
    "arían", "arías", "aréis", "erían", "erías", "eréis", "irían",
    "irías", "iréis", "ieran", "iesen", "ieron", "iendo", "ieras",
    "ieses", "abais", "arais", "aseis", "íamos", "arán", "arás",
    "aría", "erán", "erás", "ería", "irán", "irás", "iría", "iera",
    "iese", "aste", "iste", "aban", "aran", "asen", "aron", "ando",
    "abas", "adas", "idas", "aras", "ases", "íais", "ados", "idos",
    "amos", "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba",
    "ada", "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis",
    "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as",
    "ís",
)
_ES_STEP2B_GU = ("emos", "éis", "en", "es")


def stem_es(word: str) -> str:
    rv = _es_rv(word)
    r1, r2 = _regions(word, _ES_VOWELS)

    def in_rv(s, w=None):
        w = word if w is None else w
        return len(w) - len(s) >= rv

    def in_r2(s, w=None):
        w = word if w is None else w
        return len(w) - len(s) >= r2

    def in_r1(s, w=None):
        w = word if w is None else w
        return len(w) - len(s) >= r1

    # step 0: attached pronouns
    pron = _longest_suffix(word, _ES_PRON)
    if pron:
        base = word[: -len(pron)]
        pre = _longest_suffix(base, _ES_PRE_A + _ES_PRE_B + ("yendo",))
        if pre:
            if pre in _ES_PRE_A:
                if len(base) - len(pre) >= rv:
                    word = base.translate(_ES_DEACCENT)
            elif pre == "yendo":
                if len(base) >= len(pre) + 1 \
                        and base[-len(pre) - 1] == "u" \
                        and len(base) - len(pre) >= rv:
                    word = base
            else:
                if len(base) - len(pre) >= rv:
                    word = base

    did1 = False
    # step 1: standard suffixes (longest across all groups)
    groups = (_ES_STEP1_DEL_R2 + _ES_STEP1_ADOR + _ES_STEP1_IVA
              + ("logías", "logía", "uciones", "ución", "encias",
                 "encia", "amente", "mente", "idades", "idad"))
    suf = _longest_suffix(word, groups)
    if suf:
        if suf in _ES_STEP1_DEL_R2:
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
        elif suf in _ES_STEP1_ADOR:
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
                if word.endswith("ic") and in_r2("ic"):
                    word = word[:-2]
        elif suf in ("logías", "logía"):
            if in_r2(suf):
                word = word[: -len(suf)] + "log"
                did1 = True
        elif suf in ("uciones", "ución"):
            if in_r2(suf):
                word = word[: -len(suf)] + "u"
                did1 = True
        elif suf in ("encias", "encia"):
            if in_r2(suf):
                word = word[: -len(suf)] + "ente"
                did1 = True
        elif suf == "amente":
            if in_r1(suf):
                word = word[: -len(suf)]
                did1 = True
                if word.endswith("iv") and in_r2("iv"):
                    word = word[:-2]
                    if word.endswith("at") and in_r2("at"):
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and in_r2(pre):
                            word = word[:-2]
                            break
        elif suf == "mente":
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
                for pre in ("ante", "able", "ible"):
                    if word.endswith(pre) and in_r2(pre):
                        word = word[: -len(pre)]
                        break
        elif suf in ("idades", "idad"):
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and in_r2(pre):
                        word = word[: -len(pre)]
                        break
        elif suf in _ES_STEP1_IVA:
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
                if word.endswith("at") and in_r2("at"):
                    word = word[:-2]

    if not did1:
        # step 2a: verb suffixes beginning y, preceded by u
        suf = _longest_suffix(word, ("yeron", "yendo", "yamos", "yais",
                                     "yan", "yen", "yas", "yes", "ya",
                                     "ye", "yo", "yó"))
        did2a = False
        if suf and in_rv(suf) and len(word) > len(suf) \
                and word[-len(suf) - 1] == "u":
            word = word[: -len(suf)]
            did2a = True
        if not did2a:
            # step 2b
            suf = _longest_suffix(word, _ES_STEP2B_LONG + _ES_STEP2B_GU)
            if suf and in_rv(suf):
                word = word[: -len(suf)]
                if suf in _ES_STEP2B_GU and word.endswith("gu"):
                    word = word[:-1]

    # step 3: residual suffix
    suf = _longest_suffix(word, ("os", "a", "o", "á", "í", "ó", "e", "é"))
    if suf and in_rv(suf):
        word = word[: -len(suf)]
        if suf in ("e", "é") and word.endswith("gu") \
                and len(word) - 1 >= rv:
            word = word[:-1]
    return word.translate(_ES_DEACCENT)


# ---------------------------------------------------------------------------
# French
# ---------------------------------------------------------------------------

_FR_VOWELS = "aeiouyâàëéêèïîôûù"

_FR_STEP1_R2_DEL = ("ances", "iqUes", "ismes", "ables", "istes",
                    "ance", "iqUe", "isme", "able", "iste", "eux")
_FR_STEP1_ATEUR = ("atrices", "ateurs", "ations", "atrice", "ateur",
                   "ation")
_FR_STEP2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez",
    "issons", "irais", "irait", "irent", "iriez", "irons", "iront",
    "isses", "issez", "îmes", "îtes", "irai", "iras", "irez", "isse",
    "ies", "ira", "ît", "ie", "ir", "is", "it", "i",
)
_FR_STEP2B_E = ("eraIent", "erions", "èrent", "erais", "erait",
                "eriez", "erons", "eront", "erai", "eras", "erez",
                "ées", "era", "iez", "ée", "és", "er", "ez", "é")
_FR_STEP2B_A = ("assions", "assent", "assiez", "aIent", "antes",
                "asses", "ants", "asse", "ante", "ais", "ait", "ant",
                "ât", "ai", "as", "a")


def _fr_rv(word: str) -> int:
    n = len(word)
    if n >= 3 and word[0] in _FR_VOWELS and word[1] in _FR_VOWELS:
        return 3
    if word[:3] in ("par", "col", "tap"):
        return 3
    for i in range(1, n):
        if word[i] in _FR_VOWELS:
            return i + 1
    return n


def stem_fr(word: str) -> str:
    # prelude: mark u/i between vowels, y next to a vowel, u after q
    ch = list(word)
    n = len(ch)
    for i in range(n):
        c = ch[i]
        prev_v = i > 0 and word[i - 1] in _FR_VOWELS
        next_v = i + 1 < n and word[i + 1] in _FR_VOWELS
        if c in "ui" and prev_v and next_v:
            ch[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            ch[i] = "Y"
        elif c == "u" and i > 0 and word[i - 1] == "q":
            ch[i] = "U"
    word = "".join(ch)
    rv = _fr_rv(word)
    r1, r2 = _regions(word, _FR_VOWELS)

    def in_(region, s, w=None):
        w = word if w is None else w
        return len(w) - len(s) >= region

    orig = word
    found_ment = False
    did1 = False

    suf = _longest_suffix(word, _FR_STEP1_R2_DEL + _FR_STEP1_ATEUR + (
        "issements", "issement", "logies", "logie", "usions", "utions",
        "usion", "ution", "ements", "ement", "amment", "emment",
        "ences", "ence", "ments", "ment", "ités", "ité", "ives", "ive",
        "ifs", "if", "eaux", "aux", "euses", "euse"))
    if suf:
        if suf in _FR_STEP1_R2_DEL:
            if in_(r2, suf):
                word = word[: -len(suf)]
                did1 = True
        elif suf in _FR_STEP1_ATEUR:
            if in_(r2, suf):
                word = word[: -len(suf)]
                did1 = True
                if word.endswith("ic"):
                    if in_(r2, "ic"):
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
        elif suf in ("logies", "logie"):
            if in_(r2, suf):
                word = word[: -len(suf)] + "log"
                did1 = True
        elif suf in ("usions", "utions", "usion", "ution"):
            if in_(r2, suf):
                word = word[: -len(suf)] + "u"
                did1 = True
        elif suf in ("ences", "ence"):
            if in_(r2, suf):
                word = word[: -len(suf)] + "ent"
                did1 = True
        elif suf in ("ements", "ement"):
            if in_(rv, suf):
                word = word[: -len(suf)]
                did1 = True
                if word.endswith("iv") and in_(r2, "iv"):
                    word = word[:-2]
                    if word.endswith("at") and in_(r2, "at"):
                        word = word[:-2]
                elif word.endswith("eus"):
                    if in_(r2, "eus"):
                        word = word[:-3]
                    elif in_(r1, "eus"):
                        word = word[:-3] + "eux"
                elif word.endswith("abl") and in_(r2, "abl"):
                    word = word[:-3]
                elif word.endswith("iqU") and in_(r2, "iqU"):
                    word = word[:-3]
                elif word.endswith("ièr") and in_(rv, "ièr"):
                    word = word[:-3] + "i"
                elif word.endswith("Ièr") and in_(rv, "Ièr"):
                    word = word[:-3] + "i"
        elif suf in ("ités", "ité"):
            if in_(r2, suf):
                word = word[: -len(suf)]
                did1 = True
                if word.endswith("abil"):
                    if in_(r2, "abil"):
                        word = word[:-4]
                    else:
                        word = word[:-4] + "abl"
                elif word.endswith("ic"):
                    if in_(r2, "ic"):
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
                elif word.endswith("iv") and in_(r2, "iv"):
                    word = word[:-2]
        elif suf in ("ives", "ive", "ifs", "if"):
            if in_(r2, suf):
                word = word[: -len(suf)]
                did1 = True
                if word.endswith("at") and in_(r2, "at"):
                    word = word[:-2]
                    if word.endswith("ic"):
                        if in_(r2, "ic"):
                            word = word[:-2]
                        else:
                            word = word[:-2] + "iqU"
        elif suf == "eaux":
            word = word[:-1]  # eaux -> eau
            did1 = True
        elif suf == "aux":
            if in_(r1, suf):
                word = word[:-2] + "l"  # aux -> al
                did1 = True
        elif suf in ("euses", "euse"):
            if in_(r2, suf):
                word = word[: -len(suf)]
                did1 = True
            elif in_(r1, suf):
                word = word[: -len(suf)] + "eux"
                did1 = True
        elif suf in ("issements", "issement"):
            if in_(r1, suf) and len(word) > len(suf) \
                    and word[-len(suf) - 1] not in _FR_VOWELS:
                word = word[: -len(suf)]
                did1 = True
        elif suf == "amment":
            if in_(rv, suf):
                word = word[: -len(suf)] + "ant"
                found_ment = True
        elif suf == "emment":
            if in_(rv, suf):
                word = word[: -len(suf)] + "ent"
                found_ment = True
        elif suf in ("ments", "ment"):
            if len(word) > len(suf) and word[-len(suf) - 1] in _FR_VOWELS \
                    and in_(rv, "e" + suf):
                word = word[: -len(suf)]
                found_ment = True

    do2 = (not did1) or found_ment
    did2 = False
    if do2:
        # step 2a: verb suffixes beginning i, preceded by a non-vowel
        suf = _longest_suffix(word, _FR_STEP2A)
        if suf and in_(rv, suf) and len(word) > len(suf) \
                and word[-len(suf) - 1] not in _FR_VOWELS \
                and len(word) - len(suf) - 1 >= rv:
            word = word[: -len(suf)]
            did2 = True
        if not did2:
            # step 2b
            suf = _longest_suffix(word, _FR_STEP2B_E + _FR_STEP2B_A
                                  + ("ions",))
            if suf:
                if suf == "ions":
                    if in_(r2, suf) and in_(rv, suf):
                        word = word[: -len(suf)]
                        did2 = True
                elif suf in _FR_STEP2B_E:
                    if in_(rv, suf):
                        word = word[: -len(suf)]
                        did2 = True
                else:
                    if in_(rv, suf):
                        word = word[: -len(suf)]
                        did2 = True
                        if word.endswith("e") and in_(rv, "e"):
                            word = word[:-1]

    if word != orig:
        # step 3
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # step 4
        if word.endswith("s") and len(word) >= 2 \
                and word[-2] not in "aiouès" and word[-2] != "H":
            word = word[:-1]
        suf = _longest_suffix(word, ("ière", "Ière", "ion", "ier",
                                     "Ier", "ë", "e"))
        if suf:
            if suf == "ion":
                # delete if in R2 and preceded by s or t (itself in RV)
                if in_(r2, suf) and len(word) >= 4 and word[-4] in "st" \
                        and len(word) - 4 >= rv:
                    word = word[:-3]
            elif suf in ("ière", "Ière", "ier", "Ier"):
                if in_(rv, suf):
                    word = word[: -len(suf)] + "i"
            elif suf == "e":
                if in_(rv, suf):
                    word = word[:-1]
            elif suf == "ë":
                if word.endswith("guë") and len(word) - 1 >= rv:
                    word = word[:-1]
    # step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if word.endswith(end):
            word = word[:-1]
            break
    # step 6: un-accent final é/è + consonants
    i = len(word) - 1
    seen_cons = False
    while i >= 0:
        if word[i] in _FR_VOWELS:
            if word[i] in "éè" and seen_cons:
                word = word[:i] + "e" + word[i + 1:]
            break
        seen_cons = True
        i -= 1
    return (word.replace("I", "i").replace("U", "u").replace("Y", "y"))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Italian
# ---------------------------------------------------------------------------

_IT_VOWELS = "aeiouàèìòù"
_IT_DEACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRON = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene",
    "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
    "telo", "tene", "cela", "cele", "celi", "celo", "cene", "vela",
    "vele", "veli", "velo", "vene", "gli", "ci", "la", "le", "li",
    "lo", "mi", "ne", "si", "ti", "vi",
)
_IT_STEP1_DEL_R2 = (
    "atrice", "atrici", "abile", "abili", "ibile", "ibili", "anza",
    "anze", "iche", "ichi", "ismo", "ismi", "ista", "iste", "isti",
    "istà", "istè", "istì", "mente", "ante", "anti", "ico", "ici",
    "ica", "ice", "oso", "osi", "osa", "ose",
)
_IT_STEP1_AZIONE = ("azione", "azioni", "atore", "atori")
_IT_STEP2 = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda",
    "ende", "endi", "endo", "erai", "erei", "iamo", "Iamo", "immo",
    "irai", "irei", "isca", "isce", "isci", "isco", "ano", "are",
    "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà", "ere",
    "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò", "ita",
    "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir",
)


def _romance_rv(word: str, vowels: str) -> int:
    """Shared Spanish/Italian/Portuguese RV definition."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in vowels:
        for i in range(2, n):
            if word[i] in vowels:
                return i + 1
        return n
    if word[0] in vowels and word[1] in vowels:
        for i in range(2, n):
            if word[i] not in vowels:
                return i + 1
        return n
    return 3


def stem_it(word: str) -> str:
    """Snowball Italian (snowballstem.org/algorithms/italian/)."""
    word = word.translate(_IT_DEACUTE)
    # prelude: mark u after q and u/i between vowels as non-vowels
    ch = list(word)
    n = len(ch)
    for i in range(n):
        c = ch[i]
        if c == "u" and i > 0 and word[i - 1] == "q":
            ch[i] = "U"
        elif c in "ui" and 0 < i < n - 1 \
                and word[i - 1] in _IT_VOWELS and word[i + 1] in _IT_VOWELS:
            ch[i] = c.upper()
    word = "".join(ch)
    rv = _romance_rv(word, _IT_VOWELS)
    r1, r2 = _regions(word, _IT_VOWELS)

    def in_rv(s, w=None):
        w = word if w is None else w
        return len(w) - len(s) >= rv

    def in_r2(s, w=None):
        w = word if w is None else w
        return len(w) - len(s) >= r2

    # step 0: attached pronouns after a verb ending
    pron = _longest_suffix(word, _IT_PRON)
    if pron:
        base = word[: -len(pron)]
        pre = _longest_suffix(base, ("ando", "endo", "ar", "er", "ir"))
        if pre and len(base) - len(pre) >= rv:
            word = base if pre in ("ando", "endo") else base + "e"

    did1 = False
    suf = _longest_suffix(
        word, _IT_STEP1_DEL_R2 + _IT_STEP1_AZIONE
        + ("logia", "logie", "uzione", "uzioni", "usione", "usioni",
           "enza", "enze", "amento", "amenti", "imento", "imenti",
           "amente", "ità", "ivo", "ivi", "iva", "ive"))
    if suf:
        if suf in _IT_STEP1_DEL_R2:
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
        elif suf in _IT_STEP1_AZIONE:
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
                if word.endswith("ic") and in_r2("ic"):
                    word = word[:-2]
        elif suf in ("logia", "logie"):
            if in_r2(suf):
                word = word[: -len(suf)] + "log"
                did1 = True
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(suf):
                word = word[: -len(suf)] + "u"
                did1 = True
        elif suf in ("enza", "enze"):
            if in_r2(suf):
                word = word[: -len(suf)] + "ente"
                did1 = True
        elif suf in ("amento", "amenti", "imento", "imenti"):
            if in_rv(suf):
                word = word[: -len(suf)]
                did1 = True
        elif suf == "amente":
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
                did1 = True
                if word.endswith("iv") and in_r2("iv"):
                    word = word[:-2]
                    if word.endswith("at") and in_r2("at"):
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "abil"):
                        if word.endswith(pre) and in_r2(pre):
                            word = word[: -len(pre)]
                            break
        elif suf == "ità":
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and in_r2(pre):
                        word = word[: -len(pre)]
                        break
        elif suf in ("ivo", "ivi", "iva", "ive"):
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
                if word.endswith("at") and in_r2("at"):
                    word = word[:-2]
                    if word.endswith("ic") and in_r2("ic"):
                        word = word[:-2]

    if not did1:
        suf = _longest_suffix(word, _IT_STEP2)
        if suf and in_rv(suf):
            word = word[: -len(suf)]

    # step 3a: final vowel (and a preceding i) in RV
    if word and word[-1] in "aeioàèìò" and in_rv(word[-1]):
        word = word[:-1]
        if word.endswith("i") and in_rv("i"):
            word = word[:-1]
    # step 3b: ch/gh -> c/g in RV
    if (word.endswith("ch") or word.endswith("gh")) and in_rv("h"):
        word = word[:-1]
    return word.lower()


# ---------------------------------------------------------------------------
# Portuguese
# ---------------------------------------------------------------------------

_PT_VOWELS = "aeiouáéíóúâêô"

_PT_STEP1_DEL_R2 = (
    "amentos", "imentos", "amento", "imento", "adoras", "adores",
    "aço~es", "ismos", "istas", "adora", "aça~o", "antes", "ância",
    "ezas", "icos", "icas", "ismo", "ável", "ível", "ista", "osos",
    "osas", "ador", "ante", "eza", "ico", "ica", "oso", "osa",
)
_PT_STEP2 = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis",
    "áramos", "éramos", "íramos", "ávamos", "aremos", "eremos",
    "iremos", "ariam", "eriam", "iriam", "assem", "essem", "issem",
    "ara~o", "era~o", "ira~o", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "áveis", "íamos", "armos", "ermos", "irmos", "aria", "eria",
    "iria", "asse", "esse", "isse", "aste", "este", "iste", "arei",
    "erei", "irei", "aram", "eram", "iram", "avam", "arem", "erem",
    "irem", "ando", "endo", "indo", "adas", "idas", "arás", "aras",
    "erás", "eras", "irás", "avas", "ares", "eres", "ires", "íeis",
    "ados", "idos", "ámos", "amos", "emos", "imos", "iras", "ada",
    "ida", "ará", "ara", "erá", "era", "irá", "ava", "iam", "ado",
    "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am", "em", "ar",
    "er", "ir", "as", "es", "is", "eu", "iu", "ou",
)


def stem_pt(word: str) -> str:
    """Snowball Portuguese (snowballstem.org/algorithms/portuguese/)."""
    word = word.replace("ã", "a~").replace("õ", "o~")
    rv = _romance_rv(word, _PT_VOWELS)
    r1, r2 = _regions(word, _PT_VOWELS)

    def in_rv(s, w=None):
        w = word if w is None else w
        return len(w) - len(s) >= rv

    def in_r2(s, w=None):
        w = word if w is None else w
        return len(w) - len(s) >= r2

    did1 = False
    suf = _longest_suffix(
        word, _PT_STEP1_DEL_R2
        + ("logias", "logia", "uço~es", "uça~o", "ências", "ência",
           "amente", "mente", "idades", "idade", "ivas", "ivos",
           "iva", "ivo", "iras", "ira"))
    if suf:
        if suf in _PT_STEP1_DEL_R2:
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
        elif suf in ("logias", "logia"):
            if in_r2(suf):
                word = word[: -len(suf)] + "log"
                did1 = True
        elif suf in ("uço~es", "uça~o"):
            if in_r2(suf):
                word = word[: -len(suf)] + "u"
                did1 = True
        elif suf in ("ências", "ência"):
            if in_r2(suf):
                word = word[: -len(suf)] + "ente"
                did1 = True
        elif suf == "amente":
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
                did1 = True
                if word.endswith("iv") and in_r2("iv"):
                    word = word[:-2]
                    if word.endswith("at") and in_r2("at"):
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and in_r2(pre):
                            word = word[:-2]
                            break
        elif suf == "mente":
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
                for pre in ("ante", "avel", "ível"):
                    if word.endswith(pre) and in_r2(pre):
                        word = word[: -len(pre)]
                        break
        elif suf in ("idades", "idade"):
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and in_r2(pre):
                        word = word[: -len(pre)]
                        break
        elif suf in ("ivas", "ivos", "iva", "ivo"):
            if in_r2(suf):
                word = word[: -len(suf)]
                did1 = True
                if word.endswith("at") and in_r2("at"):
                    word = word[:-2]
        elif suf in ("iras", "ira"):
            if in_rv(suf) and len(word) > len(suf) \
                    and word[-len(suf) - 1] == "e":
                word = word[: -len(suf)] + "ir"
                did1 = True

    did2 = False
    if not did1:
        suf = _longest_suffix(word, _PT_STEP2)
        if suf and in_rv(suf):
            word = word[: -len(suf)]
            did2 = True

    if did1 or did2:
        # step 3: ci -> c
        if word.endswith("i") and in_rv("i") and len(word) > 1 \
                and word[-2] == "c":
            word = word[:-1]
    else:
        # step 4: residual suffix
        suf = _longest_suffix(word, ("os", "a", "i", "o", "á", "í", "ó"))
        if suf and in_rv(suf):
            word = word[: -len(suf)]

    # step 5: residual final e / cedilla
    if word and word[-1] in "eéê" and in_rv(word[-1]):
        word = word[:-1]
        if ((word.endswith("gu") and in_rv("u"))
                or (word.endswith("ci") and in_rv("i"))):
            word = word[:-1]
    elif word.endswith("ç"):
        word = word[:-1] + "c"
    return word.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Dutch
# ---------------------------------------------------------------------------

_NL_VOWELS = "aeiouyè"
_NL_DEACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _nl_undouble(word: str) -> str:
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1]
    return word


def stem_nl(word: str) -> str:
    """Snowball Dutch (snowballstem.org/algorithms/dutch/)."""
    word = word.translate(_NL_DEACCENT)
    # prelude: initial y, y after vowel, i between vowels -> upper case
    ch = list(word)
    n = len(ch)
    for i in range(n):
        c = ch[i]
        prev_v = i > 0 and word[i - 1] in _NL_VOWELS
        next_v = i + 1 < n and word[i + 1] in _NL_VOWELS
        if c == "y" and (i == 0 or prev_v):
            ch[i] = "Y"
        elif c == "i" and prev_v and next_v:
            ch[i] = "I"
    word = "".join(ch)
    r1, r2 = _regions(word, _NL_VOWELS)
    r1 = max(r1, 3)

    def in_r1(s, w=None):
        w = word if w is None else w
        return len(w) - len(s) >= r1

    def in_r2(s, w=None):
        w = word if w is None else w
        return len(w) - len(s) >= r2

    def valid_s_end(w):
        return w and w[-1] not in _NL_VOWELS + "j"

    def valid_en_end(w):
        return w and w[-1] not in _NL_VOWELS and not w.endswith("gem")

    def del_en(w):
        suf = _longest_suffix(w, ("ene", "en"))
        if suf and len(w) - len(suf) >= r1 \
                and valid_en_end(w[: -len(suf)]):
            return _nl_undouble(w[: -len(suf)])
        return w

    # step 1
    suf = _longest_suffix(word, ("heden", "ene", "en", "se", "s"))
    if suf == "heden":
        if in_r1(suf):
            word = word[:-5] + "heid"
    elif suf in ("ene", "en"):
        word = del_en(word)
    elif suf in ("se", "s"):
        if in_r1(suf) and valid_s_end(word[: -len(suf)]):
            word = word[: -len(suf)]

    # step 2: final e
    e_removed = False
    if word.endswith("e") and in_r1("e") and len(word) > 1 \
            and word[-2] not in _NL_VOWELS:
        word = _nl_undouble(word[:-1])
        e_removed = True

    # step 3a: heid
    if word.endswith("heid") and in_r2("heid") and len(word) > 4 \
            and word[-5] != "c":
        word = word[:-4]
        word = del_en(word)

    # step 3b: d-suffixes
    suf = _longest_suffix(word, ("lijk", "baar", "end", "ing", "bar", "ig"))
    if suf in ("end", "ing"):
        if in_r2(suf):
            word = word[: -len(suf)]
            if word.endswith("ig") and in_r2("ig") and len(word) > 2 \
                    and word[-3] != "e":
                word = word[:-2]
            else:
                word = _nl_undouble(word)
    elif suf == "ig":
        if in_r2(suf) and len(word) > 2 and word[-3] != "e":
            word = word[:-2]
    elif suf == "lijk":
        if in_r2(suf):
            word = word[:-4]
            if word.endswith("e") and in_r1("e") and len(word) > 1 \
                    and word[-2] not in _NL_VOWELS:
                word = _nl_undouble(word[:-1])
    elif suf == "baar":
        if in_r2(suf):
            word = word[:-4]
    elif suf == "bar":
        if in_r2(suf) and e_removed:
            word = word[:-3]

    # step 4: undouble vowel (CVVD, D != I)
    if len(word) >= 4:
        c, v1, v2, d = word[-4], word[-3], word[-2], word[-1]
        if (c not in _NL_VOWELS and d not in _NL_VOWELS and d != "I"
                and v1 == v2 and v1 in "aeou"):
            word = word[:-2] + word[-1]
    return word.lower()


# ---------------------------------------------------------------------------
# Finnish
# ---------------------------------------------------------------------------

_FI_VOWELS = "aeiouyäö"
_FI_RESTRICTED = "aeiouäö"  # V: vowels other than y
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_FI_STEP1_PART = ("kaan", "kään", "kin", "han", "hän", "ko", "kö",
                  "pa", "pä")
_FI_STEP3_PLAIN = ("ssa", "ssä", "sta", "stä", "lla", "llä", "lta",
                   "ltä", "lle", "na", "nä", "ksi", "ine", "ta", "tä")
_FI_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
           "hyn": "y", "hän": "ä", "hön": "ö"}


def stem_fi(word: str) -> str:
    """Snowball Finnish (snowballstem.org/algorithms/finnish/).

    Implemented from the published step description; steps 6a-d are
    pattern matches restricted to R1, 6e is unrestricted.
    """
    r1, r2 = _regions(word, _FI_VOWELS)

    def in_r1(s, w=None):
        w = word if w is None else w
        return len(w) - len(s) >= r1

    def in_r2(s, w=None):
        w = word if w is None else w
        return len(w) - len(s) >= r2

    # step 1: particles
    suf = _longest_suffix(word, _FI_STEP1_PART + ("sti",))
    if suf == "sti":
        if in_r2(suf):
            word = word[:-3]
    elif suf and in_r1(suf):
        pre = word[-len(suf) - 1] if len(word) > len(suf) else ""
        if pre and (pre in "nt" or pre in _FI_VOWELS):
            word = word[: -len(suf)]

    # step 2: possessives
    suf = _longest_suffix(word, ("nsa", "nsä", "mme", "nne", "si",
                                 "ni", "an", "än", "en"))
    if suf and in_r1(suf):
        base = word[: -len(suf)]
        if suf == "si":
            if not base.endswith("k"):
                word = base
        elif suf == "ni":
            word = base[:-3] + "ksi" if base.endswith("kse") else base
        elif suf in ("nsa", "nsä", "mme", "nne"):
            word = base
        elif suf == "an":
            if base.endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
                word = base
        elif suf == "än":
            if base.endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
                word = base
        elif suf == "en":
            if base.endswith(("lle", "ine")):
                word = base

    # step 3: cases
    ending_removed = False
    suf = _longest_suffix(
        word, tuple(_FI_HXN) + ("siin", "seen", "den", "tten")
        + _FI_STEP3_PLAIN + ("tta", "ttä", "a", "ä", "n"))
    if suf and in_r1(suf):
        base = word[: -len(suf)]
        if suf in _FI_HXN:
            if base.endswith(_FI_HXN[suf]):
                word, ending_removed = base, True
        elif suf in ("siin", "den", "tten"):
            if len(base) >= 2 and base[-1] == "i" \
                    and base[-2] in _FI_RESTRICTED:
                word, ending_removed = base, True
        elif suf == "seen":
            if base[-2:] in _FI_LONG:
                word, ending_removed = base, True
        elif suf in ("a", "ä"):
            if len(base) >= 2 and base[-1] in _FI_VOWELS \
                    and base[-2] not in _FI_VOWELS:
                word, ending_removed = base, True
        elif suf in ("tta", "ttä"):
            if base.endswith("e"):
                word, ending_removed = base, True
        elif suf in _FI_STEP3_PLAIN:
            word, ending_removed = base, True
        elif suf == "n":
            word, ending_removed = base, True
            if word[-2:] in _FI_LONG or word.endswith("ie"):
                word = word[:-1]

    # step 4: other endings (comparatives), in R2
    suf = _longest_suffix(word, ("impi", "impa", "impä", "immi",
                                 "imma", "immä", "mpi", "mpa", "mpä",
                                 "mmi", "mma", "mmä", "eja", "ejä"))
    if suf and in_r2(suf):
        if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
            if not word[: -len(suf)].endswith("po"):
                word = word[: -len(suf)]
        else:
            word = word[: -len(suf)]

    # step 5: plurals
    if ending_removed:
        if word and word[-1] in "ij" and in_r1(word[-1]):
            word = word[:-1]
    else:
        if word.endswith("t") and in_r1("t") and len(word) > 1 \
                and word[-2] in _FI_VOWELS:
            word = word[:-1]
            suf = _longest_suffix(word, ("imma", "mma"))
            if suf and in_r2(suf):
                if suf == "imma" or not word[: -len(suf)].endswith("po"):
                    word = word[: -len(suf)]

    # step 6: tidy (a-d restricted to R1, e unrestricted)
    if word[-2:] in _FI_LONG and len(word) - 2 >= r1:
        word = word[:-1]
    if len(word) >= 2 and len(word) - 2 >= r1 \
            and word[-2] not in _FI_VOWELS and word[-1] in "aäei":
        word = word[:-1]
    if (word.endswith("oj") or word.endswith("uj")) \
            and len(word) - 2 >= r1:
        word = word[:-1]
    if word.endswith("jo") and len(word) - 2 >= r1:
        word = word[:-1]
    # e) double consonant followed by zero or more vowels
    i = len(word) - 1
    while i >= 0 and word[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and word[i] not in _FI_VOWELS and word[i] == word[i - 1]:
        word = word[:i] + word[i + 1:]
    return word


# ---------------------------------------------------------------------------
# Russian
# ---------------------------------------------------------------------------

_RU_VOWELS = "аеиоуыэюя"

_RU_PG1 = ("вшись", "вши", "в")
_RU_PG2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJ = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею",
)
_RU_PART1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PART2 = ("ивш", "ывш", "ующ")
_RU_VERB1 = (
    "ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)
_RU_VERB2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю",
)
_RU_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев", "ов",
    "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам", "ом",
    "ах", "ях", "ию", "ью", "ия", "ья", "а", "е", "и", "й", "о", "у",
    "ы", "ь", "ю", "я",
)


def stem_ru(word: str) -> str:
    """Snowball Russian (snowballstem.org/algorithms/russian/)."""
    word = word.replace("ё", "е")
    n = len(word)
    rv = n
    for i in range(n):
        if word[i] in _RU_VOWELS:
            rv = i + 1
            break
    r1, r2 = _regions(word, _RU_VOWELS)

    def _match(w, sufs, need_ja=False):
        """Longest suffix of ``sufs`` in RV (group-1 forms must follow
        а/я, which stays on the word)."""
        best = None
        for s in sufs:
            if not w.endswith(s) or len(w) - len(s) < rv:
                continue
            if need_ja:
                k = len(w) - len(s)
                if k == 0 or w[k - 1] not in "ая":
                    continue
            if best is None or len(s) > len(best):
                best = s
        return best

    # step 1
    suf = _match(word, _RU_PG2) or _match(word, _RU_PG1, need_ja=True)
    if suf:
        word = word[: -len(suf)]
    else:
        refl = _match(word, ("ся", "сь"))
        if refl:
            word = word[: -len(refl)]
        adj = _match(word, _RU_ADJ)
        if adj:
            word = word[: -len(adj)]
            part = _match(word, _RU_PART2) \
                or _match(word, _RU_PART1, need_ja=True)
            if part:
                word = word[: -len(part)]
        else:
            verb = _match(word, _RU_VERB2) \
                or _match(word, _RU_VERB1, need_ja=True)
            if verb:
                word = word[: -len(verb)]
            else:
                noun = _match(word, _RU_NOUN)
                if noun:
                    word = word[: -len(noun)]

    # step 2: final и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]
    # step 3: derivational ость/ост in R2
    suf = _longest_suffix(word, ("ость", "ост"))
    if suf and len(word) - len(suf) >= r2:
        word = word[: -len(suf)]
    # step 4
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        suf = _longest_suffix(word, ("ейше", "ейш"))
        if suf and len(word) - len(suf) >= rv:
            word = word[: -len(suf)]
            if word.endswith("нн") and len(word) - 1 >= rv:
                word = word[:-1]
        elif word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]
    return word


def _en(word: str) -> str:
    from iresearch_ray.analysis.porter2 import stem

    return stem(word)


_STEMMERS = {
    "en": _en, "english": _en,
    "de": stem_de, "german": stem_de,
    "da": stem_da, "danish": stem_da,
    "no": stem_no, "nb": stem_no, "norwegian": stem_no,
    "sv": stem_sv, "swedish": stem_sv,
    "es": stem_es, "spanish": stem_es,
    "fr": stem_fr, "french": stem_fr,
    "it": stem_it, "italian": stem_it,
    "pt": stem_pt, "portuguese": stem_pt,
    "nl": stem_nl, "dutch": stem_nl,
    "ru": stem_ru, "russian": stem_ru,
    "fi": stem_fi, "finnish": stem_fi,
}


def get_stemmer(lang: str):
    """str -> str stemmer for a locale code ('de', 'german', 'de_DE'…).
    Raises KeyError for unsupported locales (caller falls back to no
    stemming, the documented divergence)."""
    key = lang.lower().replace("-", "_").split("_")[0]
    if key in _STEMMERS:
        return _STEMMERS[key]
    return _STEMMERS[lang.lower()]  # raises KeyError
