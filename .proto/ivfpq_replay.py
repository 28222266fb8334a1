import sys
import numpy as np, duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")

rows = con.execute("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
ids = np.array([r[0] for r in rows])
X = np.array([r[1] for r in rows], dtype=np.float64)
n = len(ids)
assert (ids == np.arange(n)).all()

def strided(size):
    stride = max(n // size, 1)
    sel = (ids % stride == 0) & (ids < stride * size)
    return X[sel]

cents = strided(16)
sample = strided(48)
assign = (sample @ cents.T).argmax(axis=1)
residuals = sample - cents[assign]
books = np.empty((8, 16, 8))
for s in range(8):
    books[s] = residuals[:16, s*8:(s+1)*8]

qv = X[0]
s_all = cents @ qv
probes = [int(i) for i in sorted(range(16), key=lambda i: (-s_all[i], -i))[:4]]
table = np.stack([books[j] @ qv[j*8:(j+1)*8] for j in range(8)])  # S x K

# corpus assign + encode (probed cells only for scoring)
lists = (X @ cents.T).argmax(axis=1)
r = X - cents[lists]
codes = np.empty((n, 8), dtype=np.int64)
for s in range(8):
    rs = r[:, s*8:(s+1)*8]
    d = (books[s] ** 2).sum(axis=1)[None, :] - 2.0 * (rs @ books[s].T)
    codes[:, s] = d.argmin(axis=1)

mask = np.isin(lists, probes)
cand = np.where(mask)[0]
lut = np.take_along_axis(np.broadcast_to(table[None], (len(cand), 8, 16)),
                         codes[cand][:, :, None], axis=2)
approx = s_all[lists[cand]] + lut[:, :, 0].sum(axis=1)
order = sorted(range(len(cand)), key=lambda i: (-approx[i], cand[i]))[:50]
short = cand[order]
# exact refine
sc = (X[short] @ qv) / (np.sqrt((X[short]**2).sum(axis=1)) * np.sqrt(qv @ qv))
fin = sorted(range(len(short)), key=lambda i: (-sc[i], short[i]))[:10]
py_out = [(int(short[i]), round(float(sc[i]), 6)) for i in fin]

chain = "MAX(CASE WHEN l.s=0 THEN l.t END)"
for s in range(1, 8):
    chain = f"({chain} + MAX(CASE WHEN l.s={s} THEN l.t END))"

SQL = f"""
WITH params AS (SELECT COUNT(*) AS n FROM embeddings),
cent AS MATERIALIZED (
    SELECT ROW_NUMBER() OVER (ORDER BY e.vec_id) - 1 AS cid,
           e.embedding::DOUBLE[] AS cv
    FROM embeddings e, params p
    WHERE e.vec_id % GREATEST(p.n // 16, 1) = 0
      AND e.vec_id < GREATEST(p.n // 16, 1) * 16
),
samp AS MATERIALIZED (
    SELECT ROW_NUMBER() OVER (ORDER BY e.vec_id) - 1 AS sid,
           e.embedding::DOUBLE[] AS sv
    FROM embeddings e, params p
    WHERE e.vec_id % GREATEST(p.n // 48, 1) = 0
      AND e.vec_id < GREATEST(p.n // 48, 1) * 48
),
samp_assign AS MATERIALIZED (
    SELECT sid, sv, cid, cv FROM (
        SELECT s.sid, s.sv, c.cid, c.cv,
               ROW_NUMBER() OVER (PARTITION BY s.sid
                   ORDER BY list_inner_product(s.sv, c.cv) DESC, c.cid ASC) AS rn
        FROM samp s CROSS JOIN cent c
    ) WHERE rn = 1
),
cw2 AS MATERIALIZED (
    SELECT CAST(t.s AS INT) AS s, a.sid AS code,
           list_slice(list_transform(range(1, 65), i -> a.sv[i] - a.cv[i]),
                      CAST(t.s*8+1 AS INT), CAST((t.s+1)*8 AS INT)) AS wslice
    FROM samp_assign a CROSS JOIN range(8) t(s)
    WHERE a.sid < 16
),
cw3 AS MATERIALIZED (
    SELECT s, code, wslice, list_inner_product(wslice, wslice) AS ww FROM cw2
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
probe AS MATERIALIZED (
    SELECT cid, q_dot_c FROM (
        SELECT c.cid, list_inner_product(c.cv, q.qv) AS q_dot_c,
               ROW_NUMBER() OVER (
                   ORDER BY list_inner_product(c.cv, q.qv) DESC, c.cid DESC) AS rn
        FROM cent c CROSS JOIN q
    ) WHERE rn <= 4
),
assigned AS MATERIALIZED (
    SELECT a.vec_id, a.v, a.cv, p.q_dot_c FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS v, c.cid, c.cv,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY list_inner_product(e.embedding::DOUBLE[], c.cv) DESC,
                            c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN cent c
    ) a JOIN probe p USING (cid)
    WHERE a.rn = 1
),
res AS MATERIALIZED (
    SELECT vec_id, q_dot_c,
           list_transform(range(1, 65), i -> v[i] - cv[i]) AS rv
    FROM assigned
),
enc AS MATERIALIZED (
    SELECT vec_id, q_dot_c, s, code FROM (
        SELECT r.vec_id, r.q_dot_c, w.s, w.code,
               ROW_NUMBER() OVER (PARTITION BY r.vec_id, w.s
                   ORDER BY w.ww - 2.0 * list_inner_product(
                       list_slice(r.rv, CAST(w.s*8+1 AS INT), CAST((w.s+1)*8 AS INT)),
                       w.wslice) ASC,
                   w.code ASC) AS rn
        FROM res r CROSS JOIN cw3 w
    ) WHERE rn = 1
),
lut AS MATERIALIZED (
    SELECT w.s, w.code,
           list_inner_product(w.wslice,
               list_slice(q.qv, CAST(w.s*8+1 AS INT), CAST((w.s+1)*8 AS INT))) AS t
    FROM cw3 w CROSS JOIN q
),
sc AS MATERIALIZED (
    SELECT e.vec_id, e.q_dot_c + ({chain}) AS approx
    FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
    GROUP BY e.vec_id, e.q_dot_c
),
short AS MATERIALIZED (
    SELECT vec_id FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY approx DESC, vec_id ASC) AS rnk
        FROM sc
    ) WHERE rnk <= 50
),
refined AS (
    SELECT e.vec_id,
           list_inner_product(e.embedding::DOUBLE[], q.qv)
             / (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_inner_product(q.qv, q.qv))) AS score
    FROM embeddings e JOIN short s USING (vec_id) CROSS JOIN q
)
SELECT vec_id, ROUND(score, 6) AS score FROM (
    SELECT vec_id, score, ROW_NUMBER() OVER (ORDER BY score DESC, vec_id ASC) AS rnk
    FROM refined
) WHERE rnk <= 10 ORDER BY rnk
"""
sql_out = [(int(a), float(b)) for a, b in con.execute(SQL).fetchall()]
print("py :", py_out)
print("sql:", sql_out)
print("MATCH" if py_out == sql_out else "MISMATCH")
