"""ANSI-SQL replay of the BPE tokenizer family (functions/bpe.py,
functions/wordpiece.py) — the r09 promotion that retires the "tokenizer
training has no SQL twin" declination for the integer-state members of the
triad (q149 train, q150 encode, q237 WordPiece stats; q225's Unigram-LM
stays declined: its Viterbi DP compares float log-prob sums whose
cross-engine addition-order noise has no quantization-safe boundary).

Why this is replayable at all: BPE state is INTEGERS AND STRINGS only —
word frequencies, pair counts, symbol lists. The argmax tie-break
(count desc, pair lexicographic asc) is exact under binary string
collation on both engines, and the greedy left-to-right merge pass is
expressible as run-parity window logic:

  a candidate position i (syms[i]=a, syms[i+1]=b) is MERGED by the greedy
  scan iff its offset inside a maximal run of consecutive candidate
  positions is even — consecutive candidates only arise when a = b (the
  'aaaa' case), and the scan takes every other one.

Each training round is therefore one unnest→GROUP BY (pair counts), one
ORDER BY...LIMIT 1 (the rule), and one window pass (the merge), unrolled
``num_merges`` times as MATERIALIZED CTEs (the q44 IRLS convention —
default inlining would re-expand the chain per reference, q229 lesson).

Bounded-pass contract: BPE ENCODE (and WordPiece's greedy matcher) are
data-dependent loops — a pass per applied rule (encode) or per emitted
piece (WordPiece). Both engines share an explicit cap (``max_passes`` /
``max_len``), so parity is UNCONDITIONAL: if a pathological word (the
degenerate sweep's 5000-char token) would need more passes, both engines
stop at the same round with the same state. The caps are generous for any
real corpus (driver fixtures: max word length 8).

Scale notes (engine side unchanged): the corpus is touched once (word
collapse); every round runs on the vocabulary-sized frame. The ORACLE
unrolls the same rounds in one SQL string — size O(rounds), execution
vocabulary-sized per round.
"""

from __future__ import annotations

from .bpe import EOW

# whitespace tokens of non-empty lowercased text — the tokens() twin
# (string_split_regex '\\s+' follows the repo oracle convention; the
# RE2-vs-Java \s gap (U+000B) is pinned engine-side by
# tests/test_round9_fixes.py on ASCII fixtures)
_TOKENS = (
    "list_filter(string_split_regex(LOWER(TRIM({text}, ' ')), '\\s+'), t -> t <> '')"
)


def _words_ctes(source: str, text_col: str) -> str:
    """words(w, freq): distinct whitespace tokens with corpus frequency;
    s0(w, freq, syms): char symbols + the end-of-word marker."""
    toks = _TOKENS.format(text=text_col)
    return f"""
    words AS MATERIALIZED (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest({toks}) AS w FROM {source}
      ) GROUP BY w
    ),
    s0 AS MATERIALIZED (
      SELECT w, freq,
             list_append(list_transform(range(1, length(w) + 1), i -> w[i]),
                         '{EOW}') AS syms
      FROM words
    )"""


def _pair_count_cte(state: str, out: str) -> str:
    """{out}(a, b, cnt): adjacent-pair counts weighted by word freq."""
    return f"""
    {out} AS MATERIALIZED (
      SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq,
               unnest(list_transform(range(1, len(syms)),
                                     i -> {{'a': syms[i], 'b': syms[i+1]}})) AS p
        FROM {state} WHERE len(syms) >= 2
      ) GROUP BY 1, 2
    )"""


def _merge_pass_ctes(
    state: str, rule: str, out: str, tag: str, per_word: bool
) -> str:
    """{out}(w, freq, syms): one greedy left-to-right merge pass of
    ``rule`` applied to ``state``. ``per_word=True`` joins the rule table
    by word (encode passes: each word carries its own best-ranked pair);
    ``per_word=False`` cross-joins the 0-or-1-row global rule (train
    passes) — an explicit flag, not inferred from the tag string (r09
    advisory: tag-prefix sniffing was a hidden contract between the two
    call sites).

    Run-parity selection: ROW_NUMBER among candidate positions per word
    gives runk = i − rn (constant per maximal run); a candidate merges iff
    its ROW_NUMBER within (w, runk) is odd. A merged position i covers
    position i+1 (LAG over i). Words with no rule or no match pass through
    unchanged (LEFT JOIN → cand never true)."""
    join = f"LEFT JOIN {rule} r USING (w)" if per_word else f"LEFT JOIN {rule} r ON TRUE"
    return f"""
    x{tag} AS (
      SELECT s.w, s.freq, s.syms, r.a, r.b,
             unnest(range(1, len(s.syms) + 1)) AS i
      FROM {state} s {join}
    ),
    c{tag} AS (
      SELECT w, freq, i, syms[i] AS sym, a, b,
             (a IS NOT NULL AND i < len(syms)
              AND syms[i] = a AND syms[i+1] = b) AS cand
      FROM x{tag}
    ),
    k{tag} AS (
      SELECT *, CASE WHEN cand THEN
               i - ROW_NUMBER() OVER (PARTITION BY w, cand ORDER BY i)
             END AS runk
      FROM c{tag}
    ),
    g{tag} AS (
      SELECT *, cand AND (ROW_NUMBER() OVER (PARTITION BY w, runk ORDER BY i) % 2 = 1)
               AS selected
      FROM k{tag}
    ),
    v{tag} AS (
      SELECT w, freq, i,
             CASE WHEN selected THEN a || b ELSE sym END AS osym,
             LAG(selected, 1, false) OVER (PARTITION BY w ORDER BY i) AS covered
      FROM g{tag}
    ),
    {out} AS MATERIALIZED (
      SELECT w, freq, list(osym ORDER BY i) AS syms
      FROM v{tag} WHERE NOT covered GROUP BY w, freq
    )"""


def _train_ctes(num_merges: int) -> str:
    """CTE chain s0 → s{R}, producing top1..top{R} (0-or-1-row learned
    rules). Early stop is structural: when the best pair count is < 2 the
    round's top CTE is empty, the merge pass is a no-op (LEFT JOIN → no
    candidates), and every later round sees the identical frozen state."""
    parts = []
    for r in range(1, num_merges + 1):
        parts.append(_pair_count_cte(f"s{r-1}", f"p{r}"))
        parts.append(f"""
    top{r} AS MATERIALIZED (
      SELECT a, b, cnt FROM p{r} WHERE cnt >= 2
      ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    )""")
        parts.append(
            _merge_pass_ctes(f"s{r-1}", f"top{r}", f"s{r}", f"t{r}", per_word=False)
        )
    return ",".join(parts)


def bpe_train_oracle_sql(source: str, text_col: str, num_merges: int) -> str:
    """Replay of bpe_train(): (step, left, right, freq) in learned order."""
    steps = "\n      UNION ALL ".join(
        f'SELECT CAST({r} AS INT) AS step, a AS "left", b AS "right", cnt AS freq FROM top{r}'
        for r in range(1, num_merges + 1)
    )
    return f"""
    WITH {_words_ctes(source, text_col)},
    {_train_ctes(num_merges)}
    SELECT * FROM ({steps}) ORDER BY step
    """


def bpe_encode_oracle_sql(
    source: str,
    text_col: str,
    id_col: str,
    num_merges: int,
    max_passes: int,
) -> str:
    """Replay of bpe_train() + bpe_encode(): per-document whitespace token
    count and BPE token count. Encode re-derives each vocabulary word from
    characters and, per pass, applies the LOWEST-RANK rule present
    anywhere in the word (min over adjacent pairs joined to the rule
    table) with the same greedy merge pass — exactly functions/bpe.py
    ``encode_len`` with its ``max_passes`` cap."""
    rules = "\n      UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS rk, a, b FROM top{r}"
        for r in range(1, num_merges + 1)
    )
    parts = [f"rules AS MATERIALIZED ({rules})"]
    # e0: every distinct word back to char symbols (freq carried unused — the
    # merge-pass helper keeps (w, freq, syms))
    parts.append("e0 AS MATERIALIZED (SELECT w, freq, syms FROM s0)")
    for k in range(1, max_passes + 1):
        parts.append(f"""
    q{k} AS (
      SELECT w, MIN(rk) AS rk FROM (
        SELECT w, unnest(list_transform(range(1, len(syms)),
                                        i -> {{'a': syms[i], 'b': syms[i+1]}})) AS p
        FROM e{k-1} WHERE len(syms) >= 2
      ) s JOIN rules r ON r.a = s.p['a'] AND r.b = s.p['b']
      GROUP BY w
    ),
    w{k} AS (
      SELECT q.w, r.a, r.b FROM q{k} q JOIN rules r USING (rk)
    )""")
        parts.append(
            _merge_pass_ctes(f"e{k-1}", f"w{k}", f"e{k}", f"e{k}m", per_word=True)
        )
    return f"""
    WITH {_words_ctes(source, text_col)},
    {_train_ctes(num_merges)},
    {",".join(parts)},
    wlen AS MATERIALIZED (
      SELECT w, CAST(len(syms) AS INT) AS n_sub FROM e{max_passes}
    ),
    doc_tokens AS (
      SELECT {id_col}, unnest({_TOKENS.format(text=text_col)}) AS w
      FROM {source}
    ),
    per_doc AS (
      SELECT d.{id_col}, COUNT(*) AS n_tokens, SUM(l.n_sub) AS n_bpe
      FROM doc_tokens d JOIN wlen l USING (w)
      GROUP BY d.{id_col}
    )
    SELECT s.{id_col},
           CAST(COALESCE(p.n_tokens, 0) AS INT) AS n_tokens,
           CAST(COALESCE(p.n_bpe, 0) AS INT) AS n_bpe_tokens
    FROM {source} s LEFT JOIN per_doc p USING ({id_col})
    """


def wordpiece_stats_oracle_sql(
    source: str,
    text_col: str,
    id_col: str,
    lang_col: str,
    num_merges: int,
    max_len: int,
) -> str:
    """Replay of q237: WordPiece vocab derived from the replayed BPE rules
    (initial + ## continuation forms, EOW stripped, empties dropped), the
    greedy longest-match-first segmenter unrolled ``max_len`` rounds (each
    round consumes ≥ 1 char, and both engines [UNK] words longer than
    ``max_len``, so the unroll always suffices), then the per-lang
    fertility report."""
    rules = "\n      UNION ALL ".join(
        f"SELECT a, b FROM top{r}" for r in range(1, num_merges + 1)
    )
    parts = [f"""
    units AS (
      SELECT DISTINCT replace(a || b, '{EOW}', '') AS u FROM ({rules})
      WHERE replace(a || b, '{EOW}', '') <> ''
    ),
    vocab AS MATERIALIZED (
      SELECT u AS piece, 0 AS cont FROM units
      UNION ALL
      SELECT u AS piece, 1 AS cont FROM units
    )"""]
    # g0(w, pos, np): over-long words are one [UNK] piece and start done
    parts.append(f"""
    g0 AS MATERIALIZED (
      SELECT w,
             CASE WHEN length(w) > {max_len} THEN length(w) + 1 ELSE 1 END AS pos,
             CASE WHEN length(w) > {max_len} THEN 1 ELSE 0 END AS np
      FROM words
    )""")
    for k in range(1, max_len + 1):
        parts.append(f"""
    h{k} AS (
      SELECT g.w, g.pos, MAX(length(v.piece)) AS bl
      FROM g{k-1} g JOIN vocab v
        ON v.cont = (CASE WHEN g.pos > 1 THEN 1 ELSE 0 END)
       AND length(v.piece) <= length(g.w) - g.pos + 1
       AND substr(g.w, g.pos, length(v.piece)) = v.piece
      WHERE g.pos <= length(g.w)
      GROUP BY g.w, g.pos
    ),
    g{k} AS MATERIALIZED (
      SELECT g.w,
             CASE WHEN g.pos > length(g.w) THEN g.pos
                  ELSE g.pos + COALESCE(h.bl, 1) END AS pos,
             g.np + CASE WHEN g.pos > length(g.w) THEN 0 ELSE 1 END AS np
      FROM g{k-1} g LEFT JOIN h{k} h USING (w, pos)
    )""")
    return f"""
    WITH {_words_ctes(source, text_col)},
    {_train_ctes(num_merges)},
    {",".join(parts)},
    wstats AS MATERIALIZED (
      SELECT w, np AS n_pieces, CASE WHEN np > 1 THEN 1 ELSE 0 END AS is_split
      FROM g{max_len}
    ),
    doc_tokens AS (
      SELECT {id_col}, unnest({_TOKENS.format(text=text_col)}) AS w
      FROM {source}
    ),
    per_doc AS (
      SELECT d.{id_col}, COUNT(*) AS n_words,
             SUM(s.n_pieces) AS n_pieces, SUM(s.is_split) AS n_split
      FROM doc_tokens d JOIN wstats s USING (w)
      GROUP BY d.{id_col}
    ),
    joined AS (
      SELECT t.{lang_col} AS lang,
             COALESCE(p.n_words, 0) AS n_words,
             COALESCE(p.n_pieces, 0) AS n_pieces,
             COALESCE(p.n_split, 0) AS n_split
      FROM {source} t LEFT JOIN per_doc p USING ({id_col})
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
           ROUND(CAST(SUM(n_pieces) AS DOUBLE) / SUM(n_words), 6) AS fertility,
           ROUND(CAST(SUM(n_split) AS DOUBLE) / SUM(n_words), 6) AS split_frac
    FROM joined GROUP BY lang
    """
