from iresearch_ray.analysis.analyzers import (
    Analyzer,
    DelimiterAnalyzer,
    KeywordAnalyzer,
    NgramAnalyzer,
    SegmentationAnalyzer,
    TextAnalyzer,
    get_analyzer,
    register_analyzer,
)

__all__ = [
    "Analyzer",
    "DelimiterAnalyzer",
    "KeywordAnalyzer",
    "NgramAnalyzer",
    "SegmentationAnalyzer",
    "TextAnalyzer",
    "get_analyzer",
    "register_analyzer",
]
