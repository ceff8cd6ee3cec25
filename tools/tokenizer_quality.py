"""Tokenizer-quality evidence (round-7 verdict item 2): measure the
engine's two trainers against the mainstream reference formulations,
as numbers rather than existence proofs.

1. **BPE**: operators/bpe.py trains GPT-2-style BYTE-level BPE with
   no end-of-word marker (already pinned byte-exact against an
   independent replica of that formulation at rounds 4/64/512/1000,
   tests/test_bpe.py). The mainstream ALTERNATIVE is Sennrich et al.
   2016 ``learn_bpe`` (subword-nmt): CHARACTER symbols with the final
   character fused to a ``</w>`` end-of-word marker, most-frequent
   pair merged per round, ties broken by the LARGEST pair (the
   published implementation's ``max(stats, key=lambda x: (stats[x],
   x))``). This tool trains both on the same prose fixture at equal
   merge budgets and reports tokens/word — the number a pipeline's
   packing/epoch budget consumes — quantifying the formulation gap.

2. **Unigram-LM**: operators/unigram.py segments GREEDILY
   (lowest-average-cost-per-char, precomputed winner per offset)
   where SentencePiece segments by VITERBI (global min-cost path).
   This tool trains the engine's model, then segments every corpus
   word BOTH ways under the SAME trained costs and reports: % of
   words where greedy lands on the optimal cost, the mean excess
   cost, and the token-count delta — the measured bias a training
   pipeline inherits from consuming greedy token counts.

Run: ``python tools/tokenizer_quality.py`` — prints one JSON line
(stdout) plus a human-readable report (stderr). The measured bounds
are pinned with slack in tests/test_tokenizer_quality.py and the
numbers recorded in SCALE.md.
"""

from __future__ import annotations

import collections
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

#: prose fixture: realistic English word/char distribution (function
#: words dominate, Zipf-ish tail, punctuation attached) — the shape
#: subword trainers see in web text. ~640 words, ~330 distinct.
PROSE = [
    "the harbor master kept a careful record of every ship that "
    "entered the bay and noted the cargo the crew and the weather "
    "in a heavy leather book",
    "when the storm finally passed the fishermen walked down to "
    "the shore to inspect their boats and found that only the "
    "oldest one had broken loose from its mooring",
    "a good teacher explains the idea slowly at first and then "
    "builds on it until the whole class can solve the harder "
    "problems without any help",
    "the committee voted to repair the old stone bridge before "
    "winter because the inspection had found deep cracks in the "
    "arch and rust in the iron rails",
    "she planted the roses along the southern wall where the "
    "morning sun would reach them and the north wind could not",
    "the printing press spread quickly across the continent and "
    "within a generation the price of books had fallen far enough "
    "that ordinary families could own them",
    "travelers in the high mountains carry extra rope and warm "
    "clothing because the weather can change in minutes and the "
    "nearest shelter may be hours away",
    "the observatory on the ridge opens its dome on clear nights "
    "and volunteers record the passage of satellites while the "
    "kettle hums on the old iron stove",
    "careful measurement and honest reporting of errors matter "
    "more in the long run than any single brilliant result",
    "the library keeps its oldest manuscripts in a cold dry room "
    "below the reading hall and allows visitors to study them "
    "only under supervision",
    "every morning the baker lights the ovens before dawn so that "
    "the first loaves are ready when the market opens and the "
    "smell of fresh bread fills the square",
    "the river rises every spring when the snow melts in the "
    "mountains and the farmers move their animals to the higher "
    "fields until the water falls again",
]


# ── Sennrich et al. 2016 learn_bpe replica (subword-nmt) ───────────
def sennrich_train(texts: list[str], rounds: int):
    """Character-level BPE with the fused ``</w>`` end-of-word
    marker and the published tie-break (highest count, then
    lexicographically largest pair). Returns (merges, seg, wf)."""
    wf = collections.Counter(
        w for t in texts for w in t.split() if w != ""
    )
    seg = {
        w: tuple(w[:-1]) + (w[-1] + "</w>",) for w in wf
    }
    merges = []
    for _ in range(rounds):
        stats = collections.Counter()
        for w, syms in seg.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += wf[w]
        if not stats:
            break
        (a, b) = max(stats, key=lambda x: (stats[x], x))
        merges.append((a, b))
        merged = a + b
        for w, syms in seg.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seg[w] = tuple(out)
    return merges, seg, wf


def bpe_comparison(spark, rounds: int) -> dict:
    """tokens/word under the engine's byte-BPE vs Sennrich char-BPE
    at the same merge budget."""
    from pyspark.sql import functions as F

    from umls2rdf_spark.operators.bpe import (
        segment_words,
        train_bpe,
    )

    df = spark.createDataFrame([(t,) for t in PROSE], ["text"])
    merges, _ = train_bpe(df, "text", rounds=rounds)
    # segment via the merge table (exhaustion-safe: if the corpus's
    # pairs run out before `rounds`, the vocab-after frame empties by
    # the parity convention but the merge rules still apply)
    seg = segment_words(df, merges)
    ours = seg.select(
        "freq", F.col("n_subwords").alias("ns")
    ).agg(
        F.sum(F.col("freq") * F.col("ns")).alias("tok"),
        F.sum("freq").alias("w"),
    ).collect()[0]
    ours_tpw = ours["tok"] / ours["w"]

    merges, seg, wf = sennrich_train(PROSE, rounds)
    ref_tok = sum(len(seg[w]) * f for w, f in wf.items())
    ref_w = sum(wf.values())
    ref_tpw = ref_tok / ref_w
    return {
        "rounds": rounds,
        "byte_bpe_tokens_per_word": round(ours_tpw, 4),
        "sennrich_tokens_per_word": round(ref_tpw, 4),
        "ratio": round(ours_tpw / ref_tpw, 4),
        "sennrich_merges_done": len(merges),
    }


def unigram_comparison(
    spark,
    vocab_size: int = 256,
    rounds: int = 3,
    max_piece_len: int = 4,
    seed_size: int = 2048,
) -> dict:
    """Greedy (the engine's E-step) vs Viterbi segmentation under the
    SAME trained costs: optimality rate, excess cost, token delta."""
    from umls2rdf_spark.operators.unigram import (
        unigram_lm_train,
        unigram_vocab_after,
    )

    df = spark.createDataFrame([(t,) for t in PROSE], ["text"])
    model = unigram_lm_train(
        df, "text", vocab_size=vocab_size, rounds=rounds,
        max_piece_len=max_piece_len, seed_size=seed_size,
    )
    cost = {r["piece"]: r["cost_q"] for r in model.collect()}
    greedy = {
        r["word"]: (r["freq"], r["n_pieces"])
        for r in unigram_vocab_after(
            df, "text", model=model, max_piece_len=max_piece_len
        ).collect()
    }

    def viterbi(word):
        """min total cost_q; among equal-cost paths, fewest pieces
        (the comparison a token-count consumer cares about)."""
        n = len(word)
        INF = (float("inf"), float("inf"))
        dp = [(0, 0)] + [INF] * n  # (cost, n_pieces)
        for i in range(1, n + 1):
            for j in range(1, min(max_piece_len, i) + 1):
                p = word[i - j:i]
                if p in cost:
                    c = (dp[i - j][0] + cost[p], dp[i - j][1] + 1)
                    if c < dp[i]:
                        dp[i] = c
        return dp[n]

    # greedy path cost needs the parts; recompute from the same
    # model the segment op used (collect parts via vocab_after's
    # sibling is n_pieces only, so walk greedily here with the
    # engine's exact rule to get the cost)
    from math import lcm

    mult = lcm(*range(1, max_piece_len + 1))

    def greedy_walk(word):
        pos, pieces, total = 0, 0, 0
        n = len(word)
        while pos < n:
            cands = []
            for j in range(1, min(max_piece_len, n - pos) + 1):
                p = word[pos:pos + j]
                if p in cost:
                    # engine order: (cost_q*M) div len ASC, len DESC,
                    # piece ASC
                    cands.append(((cost[p] * mult) // j, -j, p))
            if not cands:
                return None
            _, negj, p = min(cands)
            pos += -negj
            pieces += 1
            total += cost[p]
        return total, pieces

    words = list(greedy.keys())
    n_opt = 0
    excess = []
    greedy_tok = opt_tok = 0
    for w in words:
        f, ng = greedy[w]
        g = greedy_walk(w)
        assert g is not None and g[1] == ng, (w, g, ng)
        vc, vp = viterbi(w)
        assert g[0] >= vc, w
        n_opt += g[0] == vc
        excess.append((g[0] - vc) / max(vc, 1))
        greedy_tok += f * ng
        opt_tok += f * vp
    return {
        "n_words": len(words),
        "greedy_cost_optimal_pct": round(100 * n_opt / len(words), 2),
        "mean_excess_cost_pct": round(
            100 * sum(excess) / len(excess), 3
        ),
        "greedy_tokens": greedy_tok,
        "viterbi_tokens": opt_tok,
        "token_delta_pct": round(
            100 * (greedy_tok - opt_tok) / opt_tok, 3
        ),
    }


def wordpiece_comparison(spark, rounds: int) -> dict:
    """The third family at the same merge budget (round 8):
    tokens/word under the TRAINING segmentation (merge replay) vs
    under the real greedy longest-match-first INFERENCE over the
    final piece inventory — the train/inference asymmetry that
    defines WordPiece, as a number — plus greedy-inference coverage
    (% of corpus words the longest-match walk can cover at all;
    real WordPiece emits [UNK] for the rest, this engine drops them
    fail-closed)."""
    from pyspark.sql import functions as F

    from umls2rdf_spark.operators.wordpiece import (
        train_wordpiece,
        wordpiece_pieces,
        wordpiece_segment,
    )

    df = spark.createDataFrame([(t,) for t in PROSE], ["text"])
    merges, vocab = train_wordpiece(df, "text", rounds=rounds)
    n_merges = merges.count()
    train = vocab.select(
        "freq", F.size(F.split("seg", " ")).alias("ns")
    ).agg(
        F.sum(F.col("freq") * F.col("ns")).alias("tok"),
        F.sum("freq").alias("w"),
    ).collect()[0]
    if train["w"] is None:
        # pair exhaustion before `rounds` empties the vocab (the
        # pinned parity contract) — report it instead of dividing None
        return {
            "rounds": rounds,
            "merges_done": int(n_merges),
            "exhausted": True,
            "train_tokens_per_word": None,
            "infer_tokens_per_word": None,
            "infer_coverage_pct": None,
        }
    train_tpw = train["tok"] / train["w"]
    seg = wordpiece_segment(df, wordpiece_pieces(vocab))
    inf = seg.agg(
        F.sum(F.col("freq") * F.col("n_subwords")).alias("tok"),
        F.sum("freq").alias("w"),
    ).collect()[0]
    total_w = train["w"]
    covered_w = inf["w"] or 0
    infer_tpw = (inf["tok"] / covered_w) if covered_w else None
    return {
        "rounds": rounds,
        "merges_done": int(n_merges),
        "train_tokens_per_word": round(train_tpw, 4),
        "infer_tokens_per_word": (
            round(infer_tpw, 4) if infer_tpw is not None else None
        ),
        "infer_coverage_pct": round(100.0 * covered_w / total_w, 2),
    }


def main() -> int:
    from umls2rdf_spark.session import get_spark

    spark = get_spark(
        app_name="tokenizer-quality", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "bpe": [bpe_comparison(spark, r) for r in (128, 512)],
        "unigram": unigram_comparison(spark),
        "wordpiece": [
            wordpiece_comparison(spark, r) for r in (128, 512)
        ],
    }
    for b in out["bpe"]:
        print(
            f"BPE rounds={b['rounds']}: byte-BPE "
            f"{b['byte_bpe_tokens_per_word']} tok/word vs Sennrich "
            f"{b['sennrich_tokens_per_word']} (ratio {b['ratio']})",
            file=sys.stderr,
        )
    u = out["unigram"]
    print(
        f"unigram: greedy optimal on {u['greedy_cost_optimal_pct']}% "
        f"of {u['n_words']} words; token delta "
        f"{u['token_delta_pct']}% vs Viterbi",
        file=sys.stderr,
    )
    for w in out["wordpiece"]:
        print(
            f"wordpiece rounds={w['rounds']}: train "
            f"{w['train_tokens_per_word']} tok/word, infer "
            f"{w['infer_tokens_per_word']} tok/word at "
            f"{w['infer_coverage_pct']}% greedy coverage",
            file=sys.stderr,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
