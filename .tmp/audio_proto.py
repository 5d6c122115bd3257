import duckdb
con = duckdb.connect()
con.execute("SET threads TO 16")
q = """
WITH ids AS (SELECT unnest(range(0, 500000)) AS doc_id),
twins AS (
  SELECT doc_id, doc_id AS src, false AS pert FROM ids
  UNION ALL SELECT doc_id + 90000000, doc_id, true FROM ids WHERE doc_id % 41 = 0),
cx AS (
  SELECT doc_id, pert,
    CAST(concat('0x', substring(md5(CAST(src AS VARCHAR)), 1, 2)) AS BIGINT) AS c0,
    CAST(concat('0x', substring(md5(CAST(src AS VARCHAR)), 3, 2)) AS BIGINT) AS c1,
    CAST(concat('0x', substring(md5(CAST(src AS VARCHAR)), 5, 2)) AS BIGINT) AS c2,
    CAST(concat('0x', substring(md5(CAST(src AS VARCHAR)), 7, 2)) AS BIGINT) AS c3,
    CAST(concat('0x', substring(md5(CAST(src AS VARCHAR)), 9, 2)) AS BIGINT) AS d0
  FROM twins),
sm AS (
  SELECT c.doc_id, ts.t,
    abs((c.c0 * 193 + c.c1 * ts.t + c.c2 * (ts.t * ts.t // 4)
         + c.c3 * (ts.t * ts.t * ts.t // 96) + c.d0 * (ts.t // 3)) % 65536 - 32768
        + CASE WHEN c.pert AND ts.t = 0 THEN
            (CASE WHEN (c.c0 * 193) % 65536 = 65535 THEN -1 ELSE 1 END) ELSE 0 END) AS a
  FROM cx c CROSS JOIN (SELECT unnest(range(0, 240)) AS t) ts),
win AS (SELECT doc_id, t // 3 AS w, sum(a) AS e FROM sm WHERE t < 195 GROUP BY 1, 2),
bits AS (
  SELECT a.doc_id, a.w AS k, CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
  FROM win a JOIN win b ON a.doc_id = b.doc_id AND b.w = a.w + 1 WHERE a.w < 64),
fp AS (
  SELECT doc_id,
    sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END) AS lo,
    sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END) AS hi
  FROM bits GROUP BY doc_id)
SELECT * FROM fp
"""
con.execute("CREATE TABLE fp AS " + q)
print(con.execute("""
SELECT (SELECT count(*) FROM fp) n, (SELECT count(DISTINCT (lo,hi)) FROM fp) nd
""").fetchdf().to_string())
con.execute("""CREATE TABLE banded AS
  SELECT doc_id, 0 AS band, lo % 65536 AS bucket FROM fp
  UNION ALL SELECT doc_id, 1, lo // 65536 FROM fp
  UNION ALL SELECT doc_id, 2, hi % 65536 FROM fp
  UNION ALL SELECT doc_id, 3, hi // 65536 FROM fp""")
print(con.execute("SELECT max(c) maxbucket FROM (SELECT count(*) c FROM banded GROUP BY band, bucket)").fetchdf().to_string())
print(con.execute("""
WITH cand AS (
  SELECT DISTINCT a.doc_id da, b.doc_id db
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
fpairs AS (
  SELECT da, db FROM cand c JOIN fp x ON c.da = x.doc_id JOIN fp y ON c.db = y.doc_id
  WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) <= 2)
SELECT count(*) pairs,
  sum(CASE WHEN db = da + 90000000 THEN 1 ELSE 0 END) twinpairs
FROM fpairs
""").fetchdf().to_string())
