# Prototype: unigram-LM (Viterbi-EM, exact-integer) train + encode —
# python reference implementation vs the DuckDB oracle SQL, on the
# augmented (mixed-script + special-token) documents fixture.
import duckdb, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "sf0.001"
SEED_N, MAXLEN, KEEPS = 40, 4, [24, 16]
SUFFIXES = ["данные", "δεδομένα", "データ", "résumé"]
SPECIAL = "<|sep|>"

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '/root/testdata/{SF}/documents.parquet'")

# ---------- python reference ----------
rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
from collections import Counter
wf = Counter()
docwords = {}
for doc_id, text in rows:
    text = text + f" {SPECIAL} " + SUFFIXES[int(doc_id) % 4]
    ws = text.strip().lower().split()
    docwords[doc_id] = ws
    for w in ws:
        wf[w] += 1

def viterbi(w, vocab, maxlen=MAXLEN):
    L = len(w)
    np_ = [0]*(L+1); sc = [0]*(L+1)
    for i in range(L-1, -1, -1):
        best = None
        for lp in range(1, min(maxlen, L-i)+1):
            p = w[i:i+lp]
            c = vocab.get(p)
            if c is None:
                if lp == 1: c = 0
                else: continue
            cand = (np_[i+lp]+1, -(sc[i+lp]+c))
            if best is None or cand < best: best = cand
        np_[i], sc[i] = best[0], -best[1]
    # forward reconstruction: min (np, -sc), tie longest lp
    pieces = []
    pos = 0
    while pos < L:
        best = None; bestlp = None; bestp = None
        for lp in range(1, min(maxlen, L-pos)+1):
            p = w[pos:pos+lp]
            c = vocab.get(p)
            if c is None:
                if lp == 1: c = 0
                else: continue
            cand = (np_[pos+lp]+1, -(c+sc[pos+lp]), -lp)
            if best is None or cand < best: best = cand; bestlp = lp; bestp = p
        pieces.append(bestp); pos += bestlp
    return np_[0], pieces

# seed
alpha = Counter(); subs = Counter()
for w, c in wf.items():
    for ch in w: alpha[ch] += c
    for l in range(2, MAXLEN+1):
        for s in range(0, len(w)-l+1):
            subs[w[s:s+l]] += c
seeds = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:SEED_N]
vocab = dict(alpha); vocab.update(dict(seeds))
for keep in KEEPS:
    usage = Counter()
    for w, c in wf.items():
        _, pieces = viterbi(w, vocab)
        for p in pieces: usage[p] += c
    chars = {p: max(1, usage.get(p, 0)) for p in vocab if len(p) == 1}
    multi = [(p, usage.get(p, 0)) for p in vocab if len(p) >= 2]
    multi = sorted(multi, key=lambda kv: (-kv[1], kv[0]))[:keep]
    vocab = dict(chars); vocab.update(dict(multi))
ref_train = sorted(vocab.items())
ref_encode = {}
for doc_id, ws in docwords.items():
    np_sum = sum(viterbi(w, vocab)[0] for w in ws)
    ref_encode[doc_id] = (len(ws), np_sum)

# ---------- oracle SQL ----------
ARR = "[" + ", ".join(f"'{s}'" for s in SUFFIXES) + "]"

def cand(nps, scs, w, pos, lp, with_path):
    # candidate struct for piece length lp at 1-based substr start `pos`
    look = f"m[substr({w}, {pos}, {lp})][1]"
    if lp == 1:
        np = f"{nps}[{lp}] + 1"
        negsc = f"-(coalesce({look}, 0) + {scs}[{lp}])"
    else:
        np = f"CASE WHEN {look} IS NOT NULL THEN {nps}[{lp}] + 1 END"
        negsc = f"-({look} + {scs}[{lp}])"
    s = f"{{'np': {np}, 'negsc': {negsc}"
    if with_path:
        s += f", 'neglp': -{lp}, 'p': substr({w}, {pos}, {lp}), 'lp': {lp}"
    return s + "}"

def dp_cte(name, vmname):
    cands = ",\n        ".join(cand("nps", "scs", "w", "pos", lp, False)
                              for lp in range(1, MAXLEN+1))
    return f"""{name} AS (
  SELECT w, length(w) AS pos, [CAST(0 AS BIGINT)] AS nps, [CAST(0 AS BIGINT)] AS scs FROM wf
  UNION ALL
  SELECT w, pos - 1, list_prepend(b.np, nps), list_prepend(-b.negsc, scs)
  FROM (
    SELECT w, pos, nps, scs,
      (list_sort(list_filter([
        {cands}
      ], x -> x.np IS NOT NULL)))[1] AS b
    FROM {name}, {vmname} WHERE pos > 0
  )
)"""

def path_cte(name, dname, vmname):
    # a.nparr[q.pos + lp + 1] is dp at 0-based q.pos + lp
    cands = ",\n        ".join(
        (f"{{'np': a.nparr[q.pos+2] + 1, "
         f"'negsc': -(coalesce(m[substr(q.w, q.pos+1, 1)][1], 0) + a.scarr[q.pos+2]), "
         f"'neglp': -1, 'p': substr(q.w, q.pos+1, 1), 'lp': 1}}") if lp == 1 else
        (f"{{'np': CASE WHEN m[substr(q.w, q.pos+1, {lp})][1] IS NOT NULL THEN a.nparr[q.pos+{lp+1}] + 1 END, "
         f"'negsc': -(m[substr(q.w, q.pos+1, {lp})][1] + a.scarr[q.pos+{lp+1}]), "
         f"'neglp': -{lp}, 'p': substr(q.w, q.pos+1, {lp}), 'lp': {lp}}}")
        for lp in range(1, MAXLEN+1))
    return f"""{dname}arr AS (SELECT w, list(nps[1] ORDER BY pos) AS nparr, list(scs[1] ORDER BY pos) AS scarr FROM {dname} GROUP BY w),
{name} AS (
  SELECT w, 0 AS pos, CAST([] AS VARCHAR[]) AS pieces FROM wf
  UNION ALL
  SELECT w, pos + b.lp, list_append(pieces, b.p)
  FROM (
    SELECT q.w, q.pos, q.pieces,
      (list_sort(list_filter([
        {cands}
      ], x -> x.np IS NOT NULL)))[1] AS b
    FROM {name} q JOIN {dname}arr a USING (w), {vmname} WHERE q.pos < length(q.w)
  )
)"""

def round_ctes(t, prev_v, keep):
    return f"""vm{t} AS (SELECT map(list(p ORDER BY p), list(cnt ORDER BY p)) AS m FROM {prev_v}),
{dp_cte(f'd{t}', f'vm{t}')},
{path_cte(f'p{t}', f'd{t}', f'vm{t}')},
u{t} AS MATERIALIZED (SELECT p, CAST(sum(wc) AS BIGINT) AS u FROM
  (SELECT f.wc, unnest(q.pieces) AS p FROM p{t} q JOIN wf f USING (w) WHERE q.pos = length(q.w))
  GROUP BY p),
v{t} AS MATERIALIZED (
  SELECT v.p, CAST(greatest(coalesce(u.u, 0), 1) AS BIGINT) AS cnt
  FROM {prev_v} v LEFT JOIN u{t} u USING (p) WHERE length(v.p) = 1
  UNION ALL
  SELECT p, cnt FROM (
    SELECT v.p, CAST(coalesce(u.u, 0) AS BIGINT) AS cnt
    FROM {prev_v} v LEFT JOIN u{t} u USING (p) WHERE length(v.p) >= 2
    ORDER BY cnt DESC, v.p LIMIT {keep}))"""

HEAD = f"""WITH RECURSIVE adocs AS (SELECT doc_id,
  text || ' {SPECIAL} ' || ({ARR})[CAST(doc_id % 4 + 1 AS INT)] AS text
  FROM documents),
wds AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM adocs),
wf AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM wds GROUP BY w),
alpha AS MATERIALIZED (SELECT p, CAST(sum(wc) AS BIGINT) AS cnt FROM
  (SELECT wc, unnest(list_transform(range(1, length(w)+1), i -> substr(w, CAST(i AS INT), 1))) AS p FROM wf)
  GROUP BY p),
seeds AS MATERIALIZED (SELECT p, cnt FROM (
  SELECT p, CAST(sum(wc) AS BIGINT) AS cnt FROM (
    SELECT wc, unnest(flatten(list_transform(range(2, {MAXLEN+1}), l ->
      CASE WHEN length(w) >= l THEN list_transform(range(1, length(w) - CAST(l AS INT) + 2),
        st -> substr(w, CAST(st AS INT), CAST(l AS INT))) ELSE [] END))) AS p
    FROM wf) GROUP BY p
  ORDER BY cnt DESC, p LIMIT {SEED_N})),
v0 AS MATERIALIZED (SELECT p, cnt FROM alpha UNION ALL SELECT p, cnt FROM seeds)"""

train_sql = HEAD + ",\n" + round_ctes(1, "v0", KEEPS[0]) + ",\n" + round_ctes(2, "v1", KEEPS[1]) + \
    "\nSELECT p AS piece, cnt FROM v2 ORDER BY piece"

got_train = con.execute(train_sql).fetchall()
print("train rows:", len(got_train), "ref:", len(ref_train))
if [tuple(r) for r in got_train] != ref_train:
    sref = dict(ref_train); sgot = dict(got_train)
    for k in sorted(set(sref) | set(sgot)):
        if sref.get(k) != sgot.get(k):
            print("MISMATCH", repr(k), "ref", sref.get(k), "got", sgot.get(k))
    sys.exit(1)
print("TRAIN MATCH")

encode_sql = HEAD + ",\n" + round_ctes(1, "v0", KEEPS[0]) + ",\n" + round_ctes(2, "v1", KEEPS[1]) + \
    ",\nvm3 AS (SELECT map(list(p ORDER BY p), list(cnt ORDER BY p)) AS m FROM v2),\n" + \
    dp_cte("d3", "vm3") + """,
wnp AS MATERIALIZED (SELECT w, nps[1] AS np FROM d3 WHERE pos = 0),
docw AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM adocs)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, CAST(sum(np) AS BIGINT) AS n_pieces
FROM docw JOIN wnp USING (w) GROUP BY doc_id ORDER BY doc_id"""

got_enc = con.execute(encode_sql).fetchall()
ref_enc_rows = sorted((d, v[0], v[1]) for d, v in ref_encode.items())
if [tuple(r) for r in got_enc] != ref_enc_rows:
    print("ENCODE MISMATCH")
    for g, r in zip(got_enc, ref_enc_rows):
        if tuple(g) != r: print("  got", g, "ref", r)
    sys.exit(1)
print("ENCODE MATCH", len(got_enc), "docs")
