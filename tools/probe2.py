import duckdb
con = duckdb.connect()
sf = "/root/testdata/sf0.01"
for t in ["documents", "embeddings", "events", "orders", "lineitem"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

print("jaccard >= 0.7 count + nearest-to-boundary:")
print(con.sql("""
WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
s AS (SELECT doc_id, list_distinct([array_to_string(toks[i:i+2],' ')
       for i in range(1, greatest(len(toks)-1,1))]) sh FROM t),
j AS (SELECT a.doc_id ia, b.doc_id ib,
  len(list_intersect(a.sh,b.sh))::DOUBLE
    /(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))) j
FROM s a JOIN s b ON a.doc_id < b.doc_id)
SELECT count(*) FILTER (WHERE j >= 0.7) n_pairs,
       max(j) FILTER (WHERE j < 0.7) below,
       min(j) FILTER (WHERE j >= 0.7) above FROM j
""").fetchall())

print("cos >= 0.4 count + boundary:")
print(con.sql("""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v FROM embeddings),
c AS (SELECT a.vec_id ia, b.vec_id ib,
  list_dot_product(a.v,b.v)/(sqrt(list_dot_product(a.v,a.v))*sqrt(list_dot_product(b.v,b.v))) c
FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT count(*) FILTER (WHERE round(c,4) >= 0.4),
       max(c) FILTER (WHERE round(c,4) < 0.4),
       min(c) FILTER (WHERE round(c,4) >= 0.4) FROM c
""").fetchall())

print("simhash hamming<=3 pair count:")
print(con.sql("""
WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
h AS (SELECT doc_id, len(toks) n,
  [ (list_reduce(list_transform(string_split(tok,''), c -> ascii(c)::BIGINT),
       (a,b) -> (a*31+b)%1000000007) & 1073741823) * 1073741824
  + (list_reduce(list_transform(string_split(tok,''), c -> ascii(c)::BIGINT),
       (a,b) -> (a*131+b)%1000000009) & 1073741823)
    for tok in toks] hs FROM t),
f AS (SELECT doc_id, CAST(list_sum(
  [CASE WHEN 2*len(list_filter(hs, x -> (x >> i) & 1 = 1)) > n
        THEN (1::BIGINT << i) ELSE 0::BIGINT END for i in range(0,60)]) AS BIGINT) sim
FROM h)
SELECT count(*) FROM f a JOIN f b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= 3
""").fetchall())

print("misc feature checks:")
print(con.sql("SELECT epoch_us(TIMESTAMP '2024-01-01 00:09:58.778549')").fetchall())
print(con.sql("SELECT epoch_us(min(ts)) FROM events").fetchall())
print(con.sql("SELECT CAST(year(o_orderdate) AS INT) y FROM orders LIMIT 1").fetchall())
print(con.sql("SELECT bit_count(xor(7::BIGINT, 1::BIGINT))").fetchall())
print(con.sql("SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),2) FROM lineitem").fetchall())
print(con.sql("SELECT o_orderkey, row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) rk FROM orders QUALIFY rk <= 2 LIMIT 3").fetchall())
# decimal windowed sum
print(con.sql("""SELECT event_id, CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
 (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) rv
 FROM events ORDER BY event_id LIMIT 3""").fetchall())
# regexp token count
print(con.sql("SELECT len(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) FROM documents LIMIT 2").fetchall())
# n_chars vs length(text)
print(con.sql("SELECT count(*) FROM documents WHERE n_chars != length(text)").fetchall())
