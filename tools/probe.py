# Driver-side data probe (NOT library code): checks near-dup structure in the
# synthetic test tables and validates DuckDB oracle-SQL idioms.
import duckdb

con = duckdb.connect()
sf = "/root/testdata/sf0.01"
for t in ["documents", "embeddings", "events", "orders", "lineitem"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

print("top jaccard pairs:")
print(con.sql("""
WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
s AS (SELECT doc_id, list_distinct([array_to_string(toks[i:i+2],' ')
       for i in range(1, greatest(len(toks)-1,1))]) sh FROM t)
SELECT a.doc_id, b.doc_id,
  round(len(list_intersect(a.sh,b.sh))::DOUBLE
    /(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))),4) j
FROM s a JOIN s b ON a.doc_id < b.doc_id ORDER BY j DESC LIMIT 10
""").fetchall())

print("top cosine pairs:")
print(con.sql("""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v FROM embeddings)
SELECT a.vec_id, b.vec_id,
  round(list_dot_product(a.v,b.v)
    /(sqrt(list_dot_product(a.v,a.v))*sqrt(list_dot_product(b.v,b.v))),4) c
FROM e a JOIN e b ON a.vec_id < b.vec_id ORDER BY c DESC LIMIT 10
""").fetchall())

print("simhash sql smoke (first 3 docs):")
print(con.sql("""
WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents LIMIT 3),
h AS (SELECT doc_id, len(toks) n,
  [ (list_reduce(list_transform(string_split(tok,''), c -> ascii(c)::BIGINT),
       (a,b) -> (a*31+b)%1000000007) & 1073741823) * 1073741824
  + (list_reduce(list_transform(string_split(tok,''), c -> ascii(c)::BIGINT),
       (a,b) -> (a*131+b)%1000000009) & 1073741823)
    for tok in toks] hs FROM t)
SELECT doc_id, CAST(list_sum(
  [CASE WHEN 2*len(list_filter(hs, x -> (x >> i) & 1 = 1)) > n
        THEN (1::BIGINT << i) ELSE 0::BIGINT END for i in range(0,60)]) AS BIGINT) sim
FROM h
""").fetchall())

print("fingerprint sql smoke:")
print(con.sql("""
SELECT doc_id, list_reduce(list_transform(string_split(text,''), c -> ascii(c)::BIGINT),
  (a,b) -> (a*31+b)%1000000007) fp FROM documents LIMIT 3
""").fetchall())

print("lexicon count smoke:")
print(con.sql("""
SELECT doc_id,
  len(list_filter(string_split(text,' '), t -> t IN ('fast','small','value','merge','join'))) np,
  len(list_filter(string_split(text,' '), t -> t IN ('slow','big','scan','dup','filter'))) nn
FROM documents LIMIT 3
""").fetchall())

print("events daily purchase/click overlap days:")
print(con.sql("""
WITH a AS (SELECT CAST(ts AS DATE) d, count(*) n FROM events WHERE event_type='purchase' GROUP BY 1),
b AS (SELECT CAST(ts AS DATE) d, count(*) n FROM events WHERE event_type='click' GROUP BY 1)
SELECT (SELECT count(*) FROM a), (SELECT count(*) FROM b),
       (SELECT count(*) FROM a JOIN b USING (d))
""").fetchall())
