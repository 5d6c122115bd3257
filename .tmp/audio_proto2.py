import duckdb
con = duckdb.connect()
con.execute("SET threads TO 16")
con.execute("""
CREATE TABLE fp AS
WITH ids AS (SELECT unnest(range(0, 500000)) AS doc_id),
twins AS (
  SELECT doc_id, doc_id AS src, false AS pert FROM ids
  UNION ALL SELECT doc_id + 90000000, doc_id, true FROM ids WHERE doc_id % 41 = 0),
hx AS (SELECT doc_id, pert, md5(CAST(src AS VARCHAR)) AS h FROM twins),
gw AS (
  SELECT doc_id, pert, ws.w,
    (257 * CAST(concat('0x', substring(h, 2 * (ws.w % 16) + 1, 2)) AS BIGINT)
     + 31 * CAST(concat('0x', substring(h, 2 * ((ws.w + 7) % 16) + 1, 2)) AS BIGINT)
     + ws.w * 17) % 32768 AS g
  FROM hx CROSS JOIN (SELECT unnest(range(0, 65)) AS w) ws),
en AS (
  SELECT doc_id, w,
    3 * g + CASE WHEN pert AND w = 0 THEN
      (CASE WHEN g = 32767 THEN -1 ELSE 1 END) ELSE 0 END AS e
  FROM gw),
bits AS (
  SELECT a.doc_id, a.w AS k, CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
  FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.w = a.w + 1 WHERE a.w < 64)
SELECT doc_id,
  sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END) AS lo,
  sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END) AS hi
FROM bits GROUP BY doc_id""")
print(con.execute("SELECT (SELECT count(*) FROM fp) n, (SELECT count(DISTINCT (lo,hi)) FROM fp) nd").fetchdf().to_string())
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
SELECT count(*) pairs, sum(CASE WHEN db = da + 90000000 THEN 1 ELSE 0 END) twinpairs
FROM fpairs""").fetchdf().to_string())
