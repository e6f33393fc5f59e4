from gopensearch_spark.search.bm25 import bm25_match, bm25_score_expr, bm25_scores  # noqa: F401
from gopensearch_spark.search.matchexpr import match_expr, match_expr_scores  # noqa: F401
from gopensearch_spark.search.phrase import (  # noqa: F401
    near_match,
    phrase_match,
    phrase_prefix_match,
    prefix_match,
)
from gopensearch_spark.search.readers import warm_index  # noqa: F401
from gopensearch_spark.search.wand import wand_match  # noqa: F401
