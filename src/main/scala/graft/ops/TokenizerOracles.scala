package graft.ops

/** Shared DuckDB SQL for the tokenizer-APPLICATION oracles (t31/t37/t39).
  *
  * The training loops (t30 BPE merges, t36 unigram EM) are not portable
  * SQL, but the application half is: the learned merge/piece table is
  * rendered into the oracle as a VALUES list (via [[graft.Q.dynamic]],
  * evaluated at Verify time against the run's data dir), and DuckDB then
  * re-segments the corpus INDEPENDENTLY — a true cross-engine hash check
  * of everything downstream of training (the per-doc word census, the
  * hot/tail segmentation join, the fertility arithmetic).
  *
  * BPE application is a recursive CTE over merge RANKS. The symbol
  * sequence of a word rides as a space-delimited string — each symbol
  * wrapped as ' sym ' (one leading/trailing space, two between symbols) —
  * so one leftmost-nonoverlapping `replace` of ' l  r ' → ' lr ' per rank
  * is EXACTLY the greedy merge pass: a fresh 'lr' lands in the output and
  * is never rescanned (applyMergeSeq's i += 2), boundaries can't false-
  * match because every symbol carries its own delimiters, and each merge
  * removes exactly two spaces, keeping spaces = 2·n_symbols invariant —
  * so n_tok = spaces / 2 with no final re-split.
  *
  * Unigram application is Viterbi as a recursive CTE over character
  * positions: each row carries the best (cost, n_tok) of the last
  * MaxPieceLen (=4) positions as scalar columns, the ≤4 candidate pieces
  * ending at the next position are LEFT JOINs against the piece table,
  * and the winner is the list_sort-minimum by (cost asc, piece length
  * desc) — precisely the Scala tie-break (first strict improvement
  * scanning the split point ascending keeps the longest last piece).
  * NULL is the unreachable sentinel; candidate costs NULL-propagate and
  * are filtered before the sort.
  *
  * Both formulations were verified exact against reference
  * implementations on adversarial word sets (quotes, repeated chars,
  * overlapping merges, chained same-symbol merges) — see
  * tools/proto_tok.py, which replays that equivalence check — and are
  * hash-verified end-to-end by the driver's DuckDB compare every run.
  */
private[graft] object TokenizerOracles {

  def esc(s: String): String = s.replace("'", "''")

  def mergeValues(merges: Seq[(Int, String, String, Long)]): String =
    if (merges.isEmpty) "(0, '', '')" // rank 0 joins nothing; max(rank)=0 keeps chars
    else merges.map { case (rank, l, r, _) =>
      s"($rank, '${esc(l)}', '${esc(r)}')"
    }.mkString(", ")

  def pieceValues(table: Seq[(String, Long, Long)]): String =
    table.map { case (p, _, cost) => s"('${esc(p)}', $cost)" }.mkString(", ")

  /** Per-(key, word) census of the whitespace-split corpus + the distinct
    * word-type table — the SQL mirror of wordCensus/docWords. */
  private def dwCtes(key: String): String =
    s"""dw AS (
         SELECT $key, word, count(*) AS cnt
         FROM (SELECT $key, unnest(string_split(text, ' ')) AS word FROM documents) u
         WHERE len(word) > 0
         GROUP BY $key, word),
       types AS (SELECT DISTINCT word FROM dw)"""

  /** BPE segmentation of every word type → bseg(word, n_tok). */
  private def bpeCtes(mergeVals: String): String =
    s"""merges(rank, l, r) AS (VALUES $mergeVals),
       seg AS (
         SELECT word, 0 AS rank,
                ' ' || array_to_string(list_transform(generate_series(1, len(word)),
                    i -> substring(word, i, 1)), '  ') || ' ' AS ws
         FROM types
         UNION ALL
         SELECT s.word, m.rank,
                replace(s.ws, ' ' || m.l || '  ' || m.r || ' ', ' ' || m.l || m.r || ' ')
         FROM seg s JOIN merges m ON m.rank = s.rank + 1),
       bseg AS (
         SELECT word, (len(ws) - len(replace(ws, ' ', ''))) // 2 AS n_tok
         FROM seg WHERE rank = (SELECT coalesce(max(rank), 0) FROM merges))"""

  /** Unigram Viterbi segmentation of every word type → useg(word, n_tok). */
  private def vitCtes(pieceVals: String): String =
    s"""pieces(piece, cost) AS (VALUES $pieceVals),
       wt AS (SELECT word, len(word) AS wlen FROM types),
       vit AS (
         SELECT word, wlen, 0 AS i,
                CAST(NULL AS BIGINT) AS c0, CAST(NULL AS BIGINT) AS n0,
                CAST(NULL AS BIGINT) AS c1, CAST(NULL AS BIGINT) AS n1,
                CAST(NULL AS BIGINT) AS c2, CAST(NULL AS BIGINT) AS n2,
                CAST(0 AS BIGINT) AS c3, CAST(0 AS BIGINT) AS n3
         FROM wt
         UNION ALL
         SELECT word, wlen, i, c0, n0, c1, n1, c2, n2,
                cands[1].c AS c3, cands[1].n AS n3
         FROM (
           SELECT s.word, s.wlen, s.i + 1 AS i,
                  s.c1 AS c0, s.n1 AS n0, s.c2 AS c1, s.n2 AS n1,
                  s.c3 AS c2, s.n3 AS n2,
                  list_sort(list_filter([
                    struct_pack(c := s.c3 + p1.cost, negl := -1, n := s.n3 + 1),
                    struct_pack(c := s.c2 + p2.cost, negl := -2, n := s.n2 + 1),
                    struct_pack(c := s.c1 + p3.cost, negl := -3, n := s.n1 + 1),
                    struct_pack(c := s.c0 + p4.cost, negl := -4, n := s.n0 + 1)
                  ], x -> x.c IS NOT NULL)) AS cands
           FROM vit s
           LEFT JOIN pieces p1 ON p1.piece = substring(s.word, s.i + 1, 1)
           LEFT JOIN pieces p2 ON s.i >= 1 AND p2.piece = substring(s.word, s.i, 2)
           LEFT JOIN pieces p3 ON s.i >= 2 AND p3.piece = substring(s.word, s.i - 1, 3)
           LEFT JOIN pieces p4 ON s.i >= 3 AND p4.piece = substring(s.word, s.i - 2, 4)
           WHERE s.i < s.wlen
         ) t),
       useg AS (SELECT word, n3 AS n_tok FROM vit WHERE i = wlen)"""

  /** t30: the TRAINING oracle — DuckDB learns the merge table from
    * scratch. The merge loop has a data-dependent argmax per iteration,
    * which a recursive CTE cannot express (no aggregation over the
    * recursive relation), but the iteration COUNT is the fixed conf k —
    * so the loop UNROLLS into k chained ordinary CTE steps, each one
    * (pair census over the current segmentation → tie-broken argmax →
    * leftmost-nonoverlapping replace), on the same ' sym ' string
    * encoding as the application oracle. Early exhaustion is handled
    * structurally: when no pair reaches count 2 the step's argmax CTE is
    * empty, the LEFT JOIN passes segmentations through unchanged, and
    * every later step stays empty — exactly learnDriver's stop rule.
    * Overlapping pairs count per occurrence (aaa → (a,a) twice), and the
    * ranking is (count desc, left asc, right asc), both mirroring the
    * Scala trainer; prototype-verified exact on adversarial corpora
    * (tools/proto_tok.py's sibling check). Note this SQL is corpus-
    * independent text — only k is interpolated — so the oracle re-learns
    * from whatever data dir the driver points DuckDB at. */
  def t30Sql(k: Int): String = {
    val steps = (1 to k).map { i =>
      val prev = s"seg${i - 1}"
      s"""pc$i AS (
           SELECT s[j] AS l, s[j+1] AS r, CAST(sum(freq) AS BIGINT) AS n
           FROM (SELECT freq, string_split(trim(ws), '  ') AS s FROM $prev) t,
                unnest(generate_series(1, len(t.s) - 1)) AS u(j)
           GROUP BY s[j], s[j+1]),
         m$i AS (SELECT l, r, n FROM pc$i WHERE n >= 2
                 ORDER BY n DESC, l, r LIMIT 1),
         seg$i AS MATERIALIZED (
           SELECT s.word, s.freq,
                  CASE WHEN m.l IS NULL THEN s.ws
                       ELSE replace(s.ws, ' ' || m.l || '  ' || m.r || ' ',
                                    ' ' || m.l || m.r || ' ') END AS ws
           FROM $prev s LEFT JOIN m$i m ON true)"""
    }
    val unions = (1 to k).map(i => s"SELECT $i AS rank, l, r, n FROM m$i")
    s"""WITH dw AS MATERIALIZED (
         SELECT word, count(*) AS freq
         FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
         WHERE len(word) > 0
         GROUP BY word),
       seg0 AS MATERIALIZED (
         SELECT word, freq,
                ' ' || array_to_string(list_transform(generate_series(1, len(word)),
                    i -> substring(word, i, 1)), '  ') || ' ' AS ws
         FROM dw),
       ${steps.mkString(",\n")}
       SELECT CAST(rank AS INTEGER) AS rank, l AS "left", r AS "right",
              l || r AS merged, n AS n_pairs
       FROM (${unions.mkString(" UNION ALL ")})
       ORDER BY rank"""
  }

  /** One unrolled hard-EM step for the t36 training oracle: Viterbi-
    * segment every word type under `cost${k-1}` (the same recursive-CTE
    * DP as [[vitCtes]], here also CARRYING the chosen piece list so the
    * E-step can re-count piece usage), then prune-and-renormalize into
    * `counts$k` / `cost$k` — exactly UnigramTokenizer.learn's loop body.
    * `seg$k` is materialized so the twice-referenced recursive relation
    * never re-inlines (the t30 lesson). */
  private def emStep(k: Int): String = {
    val p = s"cost${k - 1}"
    s"""vit$k AS (
         SELECT word, wlen, 0 AS i,
                CAST(NULL AS BIGINT) AS c0, CAST(NULL AS BIGINT) AS c1,
                CAST(NULL AS BIGINT) AS c2, CAST(0 AS BIGINT) AS c3,
                CAST(NULL AS VARCHAR[]) AS l0, CAST(NULL AS VARCHAR[]) AS l1,
                CAST(NULL AS VARCHAR[]) AS l2, CAST([] AS VARCHAR[]) AS l3
         FROM wt
         UNION ALL
         SELECT word, wlen, i, c0, c1, c2, cands[1].c AS c3,
                l0, l1, l2, cands[1].lst AS l3
         FROM (
           SELECT s.word, s.wlen, s.i + 1 AS i,
                  s.c1 AS c0, s.c2 AS c1, s.c3 AS c2,
                  s.l1 AS l0, s.l2 AS l1, s.l3 AS l2,
                  list_sort(list_filter([
                    struct_pack(c := s.c3 + p1.cost, negl := -1,
                                lst := list_append(s.l3, p1.piece)),
                    struct_pack(c := s.c2 + p2.cost, negl := -2,
                                lst := list_append(s.l2, p2.piece)),
                    struct_pack(c := s.c1 + p3.cost, negl := -3,
                                lst := list_append(s.l1, p3.piece)),
                    struct_pack(c := s.c0 + p4.cost, negl := -4,
                                lst := list_append(s.l0, p4.piece))
                  ], x -> x.c IS NOT NULL)) AS cands
           FROM vit$k s
           LEFT JOIN $p p1 ON p1.piece = substring(s.word, s.i + 1, 1)
           LEFT JOIN $p p2 ON s.i >= 1 AND p2.piece = substring(s.word, s.i, 2)
           LEFT JOIN $p p3 ON s.i >= 2 AND p3.piece = substring(s.word, s.i - 1, 3)
           LEFT JOIN $p p4 ON s.i >= 3 AND p4.piece = substring(s.word, s.i - 2, 4)
           WHERE s.i < s.wlen
         ) t),
       seg$k AS MATERIALIZED (SELECT word, l3 AS lst FROM vit$k WHERE i = wlen),
       used$k AS (
         SELECT piece, CAST(sum(freq) AS BIGINT) AS c
         FROM (SELECT w.freq, unnest(s.lst) AS piece
               FROM seg$k s JOIN wt w USING (word)) u
         GROUP BY piece),
       counts$k AS MATERIALIZED (
         SELECT p.piece, CAST(coalesce(u.c, 0) AS BIGINT) AS c
         FROM counts${k - 1} p LEFT JOIN used$k u USING (piece)
         WHERE len(p.piece) = 1 OR coalesce(u.c, 0) > 0),
       ${costCte(k)}"""
  }

  /** Laplace-smoothed integer micro-nat costs of `counts$k` — the SQL
    * mirror of costsFromCounts: total = sum + |vocab| as exact doubles,
    * IEEE division, one `ln` (the only non-exact op; a 1-ulp divergence
    * moves the scaled value ~1e-9, far from any rounding boundary). */
  private def costCte(k: Int): String =
    s"""cost$k AS MATERIALIZED (
         SELECT piece,
                CAST(round(-ln(CAST(c + 1 AS DOUBLE) / t.total) * 1000000)
                     AS BIGINT) AS cost
         FROM counts$k,
              (SELECT CAST(sum(c) AS DOUBLE) + count(*) AS total FROM counts$k) t)"""

  /** t36: the unigram TRAINING oracle — DuckDB re-learns the piece table
    * from scratch. Like t30, the loop's iteration count is the fixed conf
    * `iters`, so hard-EM UNROLLS into chained CTE steps: substring-census
    * seed (all chars + top-m multi by (count desc, piece asc)) → cost₀ →
    * [Viterbi E-step carrying piece lists → prune/renormalize M-step]×
    * iters → the final (rank, piece, n_uses, cost_micro) table. Corpus-
    * independent SQL — only m and iters are interpolated — so the oracle
    * re-learns from whatever data dir the driver points DuckDB at. */
  def t36Sql(m: Int, iters: Int): String = {
    val steps = (1 to iters).map(emStep).mkString(",\n")
    s"""WITH RECURSIVE dw AS MATERIALIZED (
         SELECT word, count(*) AS freq
         FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
         WHERE len(word) > 0
         GROUP BY word),
       wt AS MATERIALIZED (SELECT word, freq, len(word) AS wlen FROM dw),
       sub AS MATERIALIZED (
         SELECT substring(word, i, l) AS piece, CAST(sum(freq) AS BIGINT) AS c
         FROM wt,
              unnest(generate_series(1, wlen)) AS u(i),
              unnest(generate_series(1, 4)) AS v(l)
         WHERE i + l - 1 <= wlen
         GROUP BY 1),
       counts0 AS MATERIALIZED (
         SELECT piece, c FROM sub WHERE len(piece) = 1
         UNION ALL
         SELECT piece, c FROM (
           SELECT piece, c FROM sub WHERE len(piece) > 1
           ORDER BY c DESC, piece LIMIT $m) q),
       ${costCte(0)},
       $steps
       SELECT CAST(row_number() OVER (ORDER BY f.c DESC, f.piece) AS BIGINT) AS rank,
              f.piece, f.c AS n_uses, k.cost AS cost_micro
       FROM counts$iters f JOIN cost$iters k USING (piece)
       ORDER BY rank"""
  }

  /** t31: per-doc word + BPE token counts under the rendered merges. */
  def t31Sql(merges: Seq[(Int, String, String, Long)]): String =
    s"""WITH RECURSIVE ${dwCtes("doc_id")},
       ${bpeCtes(mergeValues(merges))}
       SELECT dw.doc_id,
              CAST(sum(dw.cnt) AS BIGINT) AS n_words,
              CAST(sum(dw.cnt * b.n_tok) AS BIGINT) AS n_bpe_tokens
       FROM dw JOIN bseg b ON b.word = dw.word
       GROUP BY dw.doc_id
       ORDER BY dw.doc_id"""

  /** t54: the tokenizer drift census — base and (reversed-word) batch
    * populations segmented under ONE rendered merge table, integer-micro
    * fertilities, and the pinned re-train gate re-decided by DuckDB. */
  def t54Sql(merges: Seq[(Int, String, String, Long)], gateMicro: Long): String =
    s"""WITH RECURSIVE
       dwb AS MATERIALIZED (
         SELECT word, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id % 5 <> 3) u
         WHERE len(word) > 0 GROUP BY word),
       dwa AS MATERIALIZED (
         SELECT reverse(word) AS word, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id % 5 = 3) u
         WHERE len(word) > 0 GROUP BY reverse(word)),
       types AS (
         -- explicit DISTINCT over UNION ALL: inside WITH RECURSIVE,
         -- DuckDB gives a bare UNION the recursive anchor/step
         -- treatment and a row can survive in BOTH branches (measured:
         -- 'a' twice → a 731-row fanout through the bseg join)
         SELECT DISTINCT word FROM (
           SELECT word FROM dwb UNION ALL SELECT word FROM dwa)),
       ${bpeCtes(mergeValues(merges))},
       cb AS (
         SELECT CAST(sum(d.cnt) AS BIGINT) AS base_words,
                CAST(sum(d.cnt * len(d.word)) AS BIGINT) AS base_chars,
                CAST(sum(d.cnt * b.n_tok) AS BIGINT) AS base_tokens
         FROM dwb d JOIN bseg b ON b.word = d.word),
       ca AS (
         SELECT CAST(sum(d.cnt) AS BIGINT) AS batch_words,
                CAST(sum(d.cnt * len(d.word)) AS BIGINT) AS batch_chars,
                CAST(sum(d.cnt * b.n_tok) AS BIGINT) AS batch_tokens
         FROM dwa d JOIN bseg b ON b.word = d.word)
       SELECT base_words, base_chars, base_tokens,
              batch_words, batch_chars, batch_tokens,
              CAST(round(1000000.0 * base_tokens / base_chars) AS BIGINT) AS base_tpc_micro,
              CAST(round(1000000.0 * batch_tokens / batch_chars) AS BIGINT) AS batch_tpc_micro,
              CAST(round(1000000.0 * batch_tokens / batch_chars)
                   - round(1000000.0 * base_tokens / base_chars) AS BIGINT) AS drift_micro,
              round(1000000.0 * batch_tokens / batch_chars)
                - round(1000000.0 * base_tokens / base_chars) >= $gateMicro AS acted
       FROM cb CROSS JOIN ca
       ORDER BY base_words"""

  /** A suffixed copy of [[bpeCtes]] so one oracle can apply TWO merge
    * tables (s41: segmentation under both tokenizer generations). */
  private def bpeCtesNamed(sfx: String, mergeVals: String,
      typesRel: String): String =
    s"""merges$sfx(rank, l, r) AS (VALUES $mergeVals),
       seg$sfx AS (
         SELECT word, 0 AS rank,
                ' ' || array_to_string(list_transform(generate_series(1, len(word)),
                    i -> substring(word, i, 1)), '  ') || ' ' AS ws
         FROM $typesRel
         UNION ALL
         SELECT s.word, m.rank,
                replace(s.ws, ' ' || m.l || '  ' || m.r || ' ', ' ' || m.l || m.r || ' ')
         FROM seg$sfx s JOIN merges$sfx m ON m.rank = s.rank + 1),
       bseg$sfx AS MATERIALIZED (
         SELECT word, (len(ws) - len(replace(ws, ' ', ''))) // 2 AS n_tok
         FROM seg$sfx WHERE rank = (SELECT coalesce(max(rank), 0) FROM merges$sfx))"""

  /** s41: the mid-stream tokenizer re-train. BOTH learned merge tables
    * render as VALUES (generation 1 = base-trained, generation 2 =
    * re-trained on base ∪ arrived batch); DuckDB independently
    * re-segments wave 0 (the reversed-word shift plant) under
    * generation 1, RE-DECIDES t54's drift gate from the rendered
    * generation-1 fertilities, and segments wave 1 under whichever
    * generation the gate selects — both branches live in the SQL, so a
    * stream that swapped when it shouldn't (or failed to swap) is a
    * hash mismatch on the wave-1 rows' values AND their `generation`
    * column. Training itself stays spec-verified (the standing
    * tokenizer discipline; t30's unrolled SQL re-learn covers the
    * trainer separately). */
  def s41Sql(merges1: Seq[(Int, String, String, Long)],
      merges2: Seq[(Int, String, String, Long)], gateMicro: Long): String =
    s"""WITH RECURSIVE
       dwb AS MATERIALIZED (
         SELECT word, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id % 5 <> 3) u
         WHERE len(word) > 0 GROUP BY word),
       dwa AS MATERIALIZED (
         SELECT doc_id, reverse(word) AS word, count(*) AS cnt
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id % 5 = 3) u
         WHERE len(word) > 0 GROUP BY doc_id, reverse(word)),
       dw1 AS MATERIALIZED (
         SELECT doc_id, word, count(*) AS cnt
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id % 5 = 3) u
         WHERE len(word) > 0 GROUP BY doc_id, word),
       types1 AS (
         SELECT DISTINCT word FROM (
           SELECT word FROM dwb UNION ALL SELECT word FROM dwa
           UNION ALL SELECT word FROM dw1)),
       types2 AS (SELECT DISTINCT word FROM dw1),
       ${bpeCtesNamed("1", mergeValues(merges1), "types1")},
       ${bpeCtesNamed("2", mergeValues(merges2), "types2")},
       cb AS (
         SELECT CAST(sum(d.cnt * len(d.word)) AS BIGINT) AS base_chars,
                CAST(sum(d.cnt * b.n_tok) AS BIGINT) AS base_tokens
         FROM dwb d JOIN bseg1 b ON b.word = d.word),
       ca AS (
         SELECT CAST(sum(d.cnt * len(d.word)) AS BIGINT) AS batch_chars,
                CAST(sum(d.cnt * b.n_tok) AS BIGINT) AS batch_tokens
         FROM (SELECT word, sum(cnt) AS cnt FROM dwa GROUP BY word) d
           JOIN bseg1 b ON b.word = d.word),
       gate AS MATERIALIZED (
         SELECT round(1000000.0 * batch_tokens / batch_chars)
                  - round(1000000.0 * base_tokens / base_chars)
                  >= $gateMicro AS acted
         FROM cb CROSS JOIN ca),
       w0 AS (
         SELECT CAST(0 AS BIGINT) AS wave, CAST(1 AS BIGINT) AS generation,
                d.doc_id,
                CAST(sum(d.cnt) AS BIGINT) AS n_words,
                CAST(sum(d.cnt * b.n_tok) AS BIGINT) AS n_bpe_tokens
         FROM dwa d JOIN bseg1 b ON b.word = d.word GROUP BY d.doc_id),
       w1 AS (
         SELECT CAST(1 AS BIGINT) AS wave,
                CASE WHEN (SELECT acted FROM gate)
                     THEN CAST(2 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS generation,
                d.doc_id,
                CAST(sum(d.cnt) AS BIGINT) AS n_words,
                CAST(sum(d.cnt * CASE WHEN (SELECT acted FROM gate)
                     THEN b2.n_tok ELSE b1.n_tok END) AS BIGINT) AS n_bpe_tokens
         FROM dw1 d
           JOIN bseg1 b1 ON b1.word = d.word
           JOIN bseg2 b2 ON b2.word = d.word
         GROUP BY d.doc_id)
       SELECT wave, generation, doc_id, n_words, n_bpe_tokens
       FROM (SELECT * FROM w0 UNION ALL SELECT * FROM w1)
       ORDER BY wave, doc_id"""

  /** t37: per-doc word + unigram token counts under the rendered pieces. */
  def t37Sql(pieces: Seq[(String, Long, Long)]): String =
    s"""WITH RECURSIVE ${dwCtes("doc_id")},
       ${vitCtes(pieceValues(pieces))}
       SELECT dw.doc_id,
              CAST(sum(dw.cnt) AS BIGINT) AS n_words,
              CAST(sum(dw.cnt * u.n_tok) AS BIGINT) AS n_unigram_tokens
       FROM dw JOIN useg u ON u.word = dw.word
       GROUP BY dw.doc_id
       ORDER BY dw.doc_id"""

  /** t39: the per-source fertility bake-off under BOTH rendered tables. */
  def t39Sql(merges: Seq[(Int, String, String, Long)],
      pieces: Seq[(String, Long, Long)]): String =
    s"""WITH RECURSIVE ${dwCtes("source")},
       ${bpeCtes(mergeValues(merges))},
       ${vitCtes(pieceValues(pieces))}
       SELECT dw.source,
              CAST(sum(dw.cnt) AS BIGINT) AS n_words,
              CAST(sum(dw.cnt * b.n_tok) AS BIGINT) AS n_bpe_tokens,
              CAST(sum(dw.cnt * u.n_tok) AS BIGINT) AS n_unigram_tokens,
              round(CAST(sum(dw.cnt * b.n_tok) AS DOUBLE)
                / CAST(sum(dw.cnt) AS DOUBLE), 4) AS fert_bpe,
              round(CAST(sum(dw.cnt * u.n_tok) AS DOUBLE)
                / CAST(sum(dw.cnt) AS DOUBLE), 4) AS fert_uni
       FROM dw
         JOIN bseg b ON b.word = dw.word
         JOIN useg u ON u.word = dw.word
       GROUP BY dw.source
       ORDER BY dw.source"""
}
