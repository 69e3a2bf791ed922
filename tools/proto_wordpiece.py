#!/usr/bin/env python3
"""Prototype of the WordPiece train+encode oracle SQL against a plain
python reference — run BEFORE wiring the Spark gates (the proto_unigram
pattern). Validates at sf0.001 and sf0.01.

Spec being pinned (shared by engine, oracle, and this reference):
  train:  char-symbol corpus; R rounds; the round's winner maximizes the
          QUANTIZED likelihood score floor(n(l,r) * 10^12 / (c(l)*c(r)))
          (Schuster-Nakajima / BERT-style scoring), ties by (lhs, rhs)
          in binary UTF-8 order; merge replaces every adjacency.
  encode: vocabulary = training alphabet + merged pieces, minus any
          piece containing an ASCII digit; greedy longest-match-first
          walk; a position with no match maps the WHOLE word to [UNK]
          (1 piece). Corpus for the encode gate is augmented with one
          digit-bearing word per document ("ref<doc_id%50>") so the UNK
          path is exercised deterministically.
"""
import duckdb
from collections import Counter

SCALE = 10**12
R = 8
SEP = "chr(31)"


def train_sql_ctes(rounds):
    head = f"""wds AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM documents),
wf AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM wds GROUP BY w),
v1 AS MATERIALIZED (SELECT {SEP} || array_to_string(list_transform(range(1, length(w)+1),
    i -> substr(w, CAST(i AS INT), 1)), {SEP} || {SEP}) || {SEP} AS vstr, wc FROM wf)"""
    stages = []
    for r in range(1, rounds + 1):
        stages.append(f""",
s{r} AS MATERIALIZED (SELECT sym, CAST(sum(wc) AS BIGINT) AS c FROM (
    SELECT wc, unnest(string_split(trim(vstr, {SEP}), {SEP} || {SEP})) AS sym FROM v{r})
  GROUP BY 1),
p{r} AS MATERIALIZED (SELECT s.lhs AS lhs, s.rhs AS rhs, CAST(sum(wc) AS BIGINT) AS total FROM (
    SELECT wc, unnest(list_transform(range(1, len(syms)), j -> {{'lhs': syms[j], 'rhs': syms[j+1]}})) AS s
    FROM (SELECT wc, string_split(trim(vstr, {SEP}), {SEP} || {SEP}) AS syms FROM v{r}))
  GROUP BY 1, 2),
b{r} AS MATERIALIZED (SELECT lhs, rhs, total,
    CAST(total::HUGEINT * {SCALE} // (cl.c::HUGEINT * cr.c) AS BIGINT) AS score_q
  FROM p{r} JOIN s{r} cl ON p{r}.lhs = cl.sym JOIN s{r} cr ON p{r}.rhs = cr.sym
  ORDER BY score_q DESC, lhs, rhs LIMIT 1),
v{r + 1} AS MATERIALIZED (SELECT replace(vstr, {SEP} || lhs || {SEP} || {SEP} || rhs || {SEP},
    {SEP} || lhs || rhs || {SEP}) AS vstr, wc FROM v{r}, b{r})""")
    return head + "".join(stages)


def train_sql(rounds):
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS round, lhs, rhs, lhs || rhs AS merged, score_q, total FROM b{r}"
        for r in range(1, rounds + 1))
    return f"WITH {train_sql_ctes(rounds)}\n{rows}"


def encode_sql(rounds):
    ctes = train_sql_ctes(rounds)
    merged = " UNION ALL ".join(f"SELECT lhs || rhs AS p FROM b{r}" for r in range(1, rounds + 1))
    return f"""WITH RECURSIVE {ctes},
alpha AS (SELECT DISTINCT substr(w, CAST(i AS INT), 1) AS p
  FROM wf, unnest(range(1, length(w)+1)) AS t(i)),
vocab AS MATERIALIZED (SELECT p FROM (SELECT p FROM alpha UNION {merged})
  WHERE NOT regexp_matches(p, '[0-9]')),
adocs AS (SELECT doc_id, text || ' ref' || CAST(doc_id % 50 AS VARCHAR) AS text FROM documents),
adw AS MATERIALIZED (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM adocs),
dwords AS MATERIALIZED (SELECT DISTINCT w FROM adw),
mt AS MATERIALIZED (SELECT d.w AS w, CAST(t.pos AS INT) AS pos, CAST(max(len(v.p)) AS INT) AS l
  FROM dwords d, unnest(range(1, length(d.w)+1)) AS t(pos), vocab v
  WHERE substr(d.w, CAST(t.pos AS INT), len(v.p)) = v.p GROUP BY 1, 2),
walk AS (
  SELECT w, 1 AS pos, 0 AS np, FALSE AS unk FROM dwords
  UNION ALL
  SELECT k.w,
    CASE WHEN m.l IS NULL THEN length(k.w) + 1 ELSE k.pos + m.l END,
    CASE WHEN m.l IS NULL THEN 1 ELSE k.np + 1 END,
    m.l IS NULL
  FROM walk k LEFT JOIN mt m ON m.w = k.w AND m.pos = k.pos
  WHERE k.pos <= length(k.w)),
res AS (SELECT w, np, unk FROM walk WHERE pos > length(w))
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(r.np) AS BIGINT) AS n_pieces,
  CAST(sum(CASE WHEN r.unk THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
FROM adw a JOIN res r ON a.w = r.w GROUP BY 1"""


def py_train(words, rounds):
    """words: Counter word->wc. Returns merge rows + final vocab pieces."""
    seqs = {w: (list(w), wc) for w, wc in words.items()}
    merges = []
    for r in range(1, rounds + 1):
        pc, sc = Counter(), Counter()
        for syms, wc in seqs.values():
            for s in syms:
                sc[s] += wc
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc
        if not pc:
            break
        scored = [((n * SCALE) // (sc[l] * sc[rr]), l.encode(), rr.encode(), l, rr, n)
                  for (l, rr), n in pc.items()]
        scored.sort(key=lambda t: (-t[0], t[1], t[2]))
        sq, _, _, l, rr, n = scored[0]
        merges.append((r, l, rr, l + rr, sq, n))
        for w, (syms, wc) in seqs.items():
            # single greedy left-to-right pass; a just-merged tail
            # (l+rr) can never re-match l, so no double merge
            out = []
            for s in syms:
                if out and out[-1] == l and s == rr:
                    out[-1] = l + rr
                else:
                    out.append(s)
            seqs[w] = (out, wc)
    return merges


def py_encode(words_by_doc, vocab, maxlen):
    res = {}
    for doc, ws in words_by_doc.items():
        nw, npcs, nunk = 0, 0, 0
        for w in ws:
            nw += 1
            pos, np, unk = 0, 0, False
            while pos < len(w):
                for lp in range(min(maxlen, len(w) - pos), 0, -1):
                    if w[pos:pos + lp] in vocab:
                        np += 1
                        pos += lp
                        break
                else:
                    np, unk = 1, True
                    break
            npcs += np
            nunk += 1 if unk else 0
        res[doc] = (nw, npcs, nunk)
    return res


def main():
    for sf in ["sf0.001", "sf0.01"]:
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '/root/testdata/{sf}/documents.parquet'")
        words = Counter()
        for (w, c) in con.execute(
                "SELECT w, count(*) FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)),'\\s+')) AS w FROM documents) GROUP BY 1").fetchall():
            words[w] = c
        ref = py_train(words, R)
        got = con.execute(train_sql(R) + " ORDER BY round").fetchall()
        ok_train = [tuple(r) for r in got] == [(r, l, rr, m, sq, n) for (r, l, rr, m, sq, n) in ref]
        print(sf, "train rounds:", len(got), "match:", ok_train)
        if not ok_train:
            for a, b in zip(got, ref):
                if tuple(a) != b:
                    print("  sql:", a, "\n  py :", b)
            return

        vocab = {p for p in ({c for w in words for c in w} | {m[3] for m in ref})
                 if not any(ch.isdigit() for ch in p)}
        maxlen = max(len(p) for p in vocab)
        docs = con.execute(
            "SELECT doc_id, lower(trim(text || ' ref' || CAST(doc_id % 50 AS VARCHAR)))"
            " FROM documents").fetchall()
        wbd = {d: t.split() for d, t in docs}
        refE = py_encode(wbd, vocab, maxlen)
        gotE = {r[0]: (r[1], r[2], r[3]) for r in con.execute(encode_sql(R)).fetchall()}
        ok_enc = refE == gotE
        unks = sum(v[2] for v in refE.values())
        print(sf, "encode docs:", len(gotE), "match:", ok_enc, "total unk words:", unks)
        if not ok_enc:
            bad = [k for k in refE if refE[k] != gotE.get(k)][:5]
            for k in bad:
                print("  doc", k, "py", refE[k], "sql", gotE.get(k))
            return


if __name__ == "__main__":
    main()
