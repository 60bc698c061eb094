from .arrays import pg_array_to_json, pg_array_text_to_json, pg_array_to_json_simple
from .dedup import (
    dedup_exact,
    dedup_minhash_lsh,
    dedup_simhash,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from .similarity import (
    ann_topk_bruteforce,
    ann_topk_bucketed,
    cosine_pairs_bucketed,
)
from .text import doc_fingerprint, lang_id, quality_score, token_stats

__all__ = [
    "pg_array_to_json",
    "pg_array_text_to_json",
    "pg_array_to_json_simple",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "ann_topk_bruteforce",
    "ann_topk_bucketed",
    "cosine_pairs_bucketed",
    "doc_fingerprint",
    "lang_id",
    "quality_score",
    "token_stats",
]
