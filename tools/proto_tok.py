#!/usr/bin/env python3
"""Dev-only equivalence check for TokenizerOracles.scala: the DuckDB
recursive-CTE BPE-apply and Viterbi formulations vs plain-Python reference
implementations (mirroring BpeTokenizer.applyMergeSeq / UnigramTokenizer
.viterbi) on adversarial word sets. Run: python3 tools/proto_tok.py
Expect: 0 mismatches on both lines."""
import duckdb, random

# ---------- reference implementations (mirror Scala applyMergeSeq / viterbi)
def apply_merge(sym, l, r):
    out = []; i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == l and sym[i+1] == r:
            out.append(l + r); i += 2
        else:
            out.append(sym[i]); i += 1
    return out

def bpe_ntok(word, merges):
    sym = list(word)
    for _, l, r in merges:
        sym = apply_merge(sym, l, r)
    return len(sym)

MAXP = 4
def viterbi_ntok(word, cost):
    n = len(word)
    INF = float('inf')
    best = [INF]*(n+1); back = [-1]*(n+1); best[0] = 0
    for i in range(1, n+1):
        for j in range(max(0, i-MAXP), i):
            if best[j] != INF and word[j:i] in cost:
                if best[j] + cost[word[j:i]] < best[i]:
                    best[i] = best[j] + cost[word[j:i]]; back[i] = j
    k = n; cnt = 0
    while k > 0:
        cnt += 1; k = back[k]
    return cnt

# ---------- toy data: adversarial words
random.seed(7)
alpha = "ab'cde"   # include a quote char to test escaping
words = ["aaa", "aaaa", "ab", "aab", "abab", "ababab", "the", "a",
         "it's", "x"] + \
        ["".join(random.choice(alpha) for _ in range(random.randint(1, 12)))
         for _ in range(200)]
words = sorted(set(words))

merges = [(1, 'a', 'a'), (2, 'a', 'b'), (3, 'aa', 'a'), (4, 'ab', 'ab'),
          (5, 't', 'h'), (6, 'th', 'e'), (7, "'", 's'), (8, 'c', 'd')]

pieces = {}
for w in words:
    for i in range(len(w)):
        for l in range(1, MAXP+1):
            if i+l <= len(w):
                pieces[w[i:i+l]] = pieces.get(w[i:i+l], 0) + 1
# keep all single chars + top 30 multis, fake integer costs
multis = sorted((p for p in pieces if len(p) > 1), key=lambda p: (-pieces[p], p))[:30]
vocab = {p for p in pieces if len(p) == 1} | set(multis)
cost = {p: (1000000 // (pieces[p] + 1)) + len(p) * 7 for p in vocab}

con = duckdb.connect()
con.sql("CREATE TABLE types AS SELECT * FROM (VALUES " +
        ", ".join(f"('{w.replace(chr(39), chr(39)*2)}')" for w in words) + ") t(word)")

def esc(s): return s.replace("'", "''")

mvals = ", ".join(f"({r}, '{esc(l)}', '{esc(rr)}')" for r, l, rr in merges)
sql_bpe = f"""
WITH RECURSIVE merges(rank, l, r) AS (VALUES {mvals}),
seg AS (
  SELECT word, 0 AS rank,
         ' ' || array_to_string(list_transform(generate_series(1, len(word)),
             i -> substring(word, i, 1)), '  ') || ' ' AS ws
  FROM types
  UNION ALL
  SELECT s.word, m.rank,
         replace(s.ws, ' ' || m.l || '  ' || m.r || ' ', ' ' || m.l || m.r || ' ')
  FROM seg s JOIN merges m ON m.rank = s.rank + 1)
SELECT word, (len(ws) - len(replace(ws, ' ', ''))) // 2 AS n_tok
FROM seg WHERE rank = (SELECT coalesce(max(rank), 0) FROM merges)
ORDER BY word
"""
got = dict(con.sql(sql_bpe).fetchall())
bad = [(w, bpe_ntok(w, merges), got.get(w)) for w in words if got.get(w) != bpe_ntok(w, merges)]
print("BPE mismatches:", bad[:10], "total", len(bad), "/", len(words))

pvals = ", ".join(f"('{esc(p)}', {c})" for p, c in sorted(cost.items()))
sql_vit = f"""
WITH RECURSIVE pieces(piece, cost) AS (VALUES {pvals}),
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
           s.c1 AS c0, s.n1 AS n0, s.c2 AS c1, s.n2 AS n1, s.c3 AS c2, s.n3 AS n2,
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
  ) t)
SELECT word, n3 AS n_tok FROM vit WHERE i = wlen ORDER BY word
"""
gotv = dict(con.sql(sql_vit).fetchall())
badv = [(w, viterbi_ntok(w, cost), gotv.get(w)) for w in words
        if gotv.get(w) != viterbi_ntok(w, cost)]
print("VIT mismatches:", badv[:10], "total", len(badv), "/", len(words))

# ---------- t30 TRAINING oracle equivalence: the unrolled k-step DuckDB
# train loop (TokenizerOracles.t30Sql) vs a reference trainer mirroring
# BpeTokenizer.learnDriver — pair census with overlapping occurrences,
# (count desc, l, r) tie-break, early stop below count 2.
def learn_ref(word_freqs, k):
    tab = [(list(w), f) for w, f in sorted(word_freqs.items())]
    out = []
    for rank in range(1, k + 1):
        counts = {}
        for sym, f in tab:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i+1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (l, r), n = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        if n < 2:
            break
        out.append((rank, l, r, n))
        def app(sym):
            o = []; i = 0
            while i < len(sym):
                if i+1 < len(sym) and sym[i] == l and sym[i+1] == r:
                    o.append(l+r); i += 2
                else:
                    o.append(sym[i]); i += 1
            return o
        tab = [(app(sym), f) for sym, f in tab]
    return out

wf = {}
for w in words * 2 + ["the", "the", "the", "of", "of"]:
    wf[w] = wf.get(w, 0) + 1
K = 12
con.sql("CREATE TABLE dwt AS SELECT * FROM (VALUES " +
        ", ".join(f"('{esc(w)}', {f})" for w, f in sorted(wf.items())) + ") t(word, freq)")
steps, unions, prev = [], [], "seg0"
for k in range(1, K+1):
    steps.append(f"""
 pc{k} AS (
   SELECT s[j] AS l, s[j+1] AS r, CAST(sum(freq) AS BIGINT) AS n
   FROM (SELECT freq, string_split(trim(ws), '  ') AS s FROM {prev}) t,
        unnest(generate_series(1, len(t.s) - 1)) AS u(j)
   GROUP BY s[j], s[j+1]),
 m{k} AS (SELECT l, r, n FROM pc{k} WHERE n >= 2 ORDER BY n DESC, l, r LIMIT 1),
 seg{k} AS MATERIALIZED (
   SELECT s.word, s.freq,
          CASE WHEN m.l IS NULL THEN s.ws
               ELSE replace(s.ws, ' ' || m.l || '  ' || m.r || ' ',
                            ' ' || m.l || m.r || ' ') END AS ws
   FROM {prev} s LEFT JOIN m{k} m ON true)""")
    unions.append(f"SELECT {k} AS rank, l, r, n FROM m{k}")
    prev = f"seg{k}"
sql_train = """WITH seg0 AS MATERIALIZED (
   SELECT word, freq,
          ' ' || array_to_string(list_transform(generate_series(1, len(word)),
              i -> substring(word, i, 1)), '  ') || ' ' AS ws
   FROM dwt),""" + ",".join(steps) + """
 SELECT rank, l, r, n FROM (""" + " UNION ALL ".join(unions) + ") ORDER BY rank"
got_train = [tuple(r) for r in con.sql(sql_train).fetchall()]
exp_train = learn_ref(wf, K)
print("TRAIN mismatches:", [] if got_train == exp_train else
      [x for x in zip(exp_train, got_train) if x[0] != x[1]][:3],
      "total", 0 if got_train == exp_train else "NONZERO",
      "/", len(exp_train))
