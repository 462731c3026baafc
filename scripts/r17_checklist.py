"""Render the r17 per-key noop-sink checklist table (markdown) from the
before/closing sweep JSONs, grouped by SURVEY section."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catena_spark import registry

CHANGED = {
    "ts_gapfill_linear": "interval-explode kernel; shrinking frame removed",
    "ts_gapfill_ffill": "interval-explode kernel",
    "ts_asof_join_forward": "shrinking frame reversed to growing",
    "llm_minhash_pairs": "size-bound pre-filter + arithmetic union",
    "llm_minhash_pairs_portable": "size-bound pre-filter",
    "llm_simhash_near_pairs": "verify before distinct; int-only dedup shuffle",
    "llm_bigram_lm_score": "shared exchange; per-(doc,bg) counts",
    "join_q2_min_cost_supplier": "semi-join below agg; window min",
    "llm_ngram_jaccard_adjacent": "2-way explode; one n-gram pass, one shuffle",
}

#: keys whose only change is the shared `_docs_norm` unsplittable-input
#: spread (OPTIMIZATION_r17.md §9) — marked distinctly in the table.
SPREAD = {
    "llm_exact_dedup", "llm_token_set_dup_pairs", "llm_minhash_pairs",
    "llm_simhash_fingerprint", "llm_ngram_jaccard_adjacent",
    "llm_tfidf_top_terms", "llm_doc_fingerprint", "llm_dedup_remap",
    "llm_bpe_token_counts", "llm_minhash_pairs_portable",
    "llm_dup_components", "llm_token_packing", "llm_pii_scrub",
    "llm_contamination_check", "llm_winnowing_fingerprint",
    "llm_bigram_lm_score", "llm_repetition_ratio", "llm_ngram_novelty",
    "llm_inverted_index", "llm_bm25_topk",
}


def main() -> None:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    bk = before.get("keys", before)
    ak = after.get("keys", after)
    default_b = "n/a (pre-stamp harness; bench quantum 36.5 ms same hour)"
    print(
        f"Before sweep vm_quantum_1task: "
        f"{before.get('vm_quantum_1task', default_b)} | closing sweep: "
        f"{after.get('vm_quantum_1task', 'n/a')}\n"
    )
    specs = registry.specs()
    by_sec: dict[str, list] = {}
    for key, spec in specs.items():
        by_sec.setdefault(spec.section, []).append(key)
    print("| §2 | key | before s | after s | status |")
    print("|---|---|---|---|---|")
    for sec in sorted(by_sec):
        for key in sorted(by_sec[sec]):
            b = bk.get(key, {}).get("median_s")
            a = ak.get(key, {}).get("median_s")
            st = CHANGED.get(key, "examined, unchanged")
            if key in SPREAD:
                suffix = " + input spread" if key in CHANGED else "input spread (§9)"
                st = (CHANGED.get(key, "") + suffix).strip()
            bs = f"{b:.2f}" if b is not None else "-"
            as_ = f"{a:.2f}" if a is not None else "-"
            print(f"| {sec} | {key} | {bs} | {as_} | {st} |")


if __name__ == "__main__":
    main()
