"""The 18 reference benchmark query categories instantiated over the
synthetic transcript vocabulary.

Mirrors ``/root/reference/scripts/iresearch-benchmark.tasks:1-18``
(High/Med/Low Term, Phrase, NGram; And/Or High x {High,Med,Low};
Prefix3; Wildcard; Fuzzy1/2; Or4High; Or6High4Med2Low;
MinMatch2High2Med), with terms drawn from the FIXTURES.md F2 frequency
bands (High ~10%/turn, Med ~1%, Low ~0.1%)."""

from __future__ import annotations

from iresearch_ray.search import filters as F

HIGH = ["the", "ref", "ok", "run", "file", "test"]
MED = ["second", "deploy", "med001", "med002", "med003", "med004"]
LOW = ["rare00042", "rare00101", "demographics"]


def reference_categories() -> dict[str, F.Filter]:
    return {
        "HighTerm": F.Term(HIGH[0]),
        "MedTerm": F.Term(MED[0]),
        "LowTerm": F.Term(LOW[0]),
        "HighPhrase": F.Phrase(["ref", "name"]),
        "MedPhrase": F.Phrase(["deploy", "target"]),
        "LowPhrase": F.Phrase(["rare00001", "rare00002"]),
        "HighNGram": F.NGramSimilarity("the ref ok", threshold=0.5),
        "MedNGram": F.NGramSimilarity("second deploy kernel", threshold=0.5),
        "LowNGram": F.NGramSimilarity("rare00001 rare00002 rare00003", threshold=0.5),
        "AndHighHigh": F.And([F.Term(HIGH[0]), F.Term(HIGH[1])]),
        "AndHighMed": F.And([F.Term(HIGH[0]), F.Term(MED[0])]),
        "AndHighLow": F.And([F.Term(HIGH[0]), F.Term(LOW[0])]),
        "OrHighHigh": F.Or([F.Term(HIGH[0]), F.Term(HIGH[1])]),
        "OrHighMed": F.Or([F.Term(HIGH[0]), F.Term(MED[0])]),
        "OrHighLow": F.Or([F.Term(HIGH[0]), F.Term(LOW[0])]),
        "Prefix3": F.Prefix("sec"),
        "Wildcard": F.Wildcard("se%nd"),
        "Fuzzy1": F.Fuzzy("deploy", 1),
        "Fuzzy2": F.Fuzzy("deploy", 2),
        "Or4High": F.Or([F.Term(t) for t in HIGH[:4]]),
        "Or6High4Med2Low": F.Or(
            [F.Term(t) for t in HIGH[:6]]
            + [F.Term(t) for t in MED[:4]]
            + [F.Term(t) for t in LOW[:2]]
        ),
        "MinMatch2High2Med": F.Or(
            [F.Term(HIGH[0]), F.Term(HIGH[1]), F.Term(MED[0]), F.Term(MED[1])],
            min_match=2,
        ),
    }
