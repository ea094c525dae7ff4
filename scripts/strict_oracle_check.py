"""Driver-style strict compare: spark.toPandas() vs duckdb .df(), values
compared by STRING RENDER (the class that cost truth_discovery /
corpus_mixture their r5 driver rows)."""
import sys, duckdb
import pandas as pd
from pyspark.sql import SparkSession
import __spark_entry__ as entry_mod

SF = sys.argv[1] if len(sys.argv) > 1 else "0.01"
SF_DIR = f"/root/testdata/sf{SF}"
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions","16")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled","true")
         .config("spark.ui.enabled","false").getOrCreate())
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracles = entry_mod.oracle_sql()
qs = entry_mod.queries()

def render(df):
    cols = sorted(df.columns, key=str.lower)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(str(v) for v in row))
    return sorted(out), [c.lower() for c in cols]

bad = []
for i, name in enumerate(sorted(qs)):
    sql = oracles.get(name)
    if sql is None:
        continue
    try:
        sdf = qs[name](spark, SF_DIR).toPandas()
        odf = con.sql(sql).df()
        srows, scols = render(sdf)
        orows, ocols = render(odf)
        if scols != ocols:
            bad.append((name, "cols", scols, ocols)); continue
        if srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:2]
            bad.append((name, "values", diff, f"{len(srows)}/{len(orows)} rows"))
    except Exception as ex:
        bad.append((name, "error", str(ex)[:200], ""))
    if (i+1) % 40 == 0:
        print(f"...{i+1} done", flush=True)
print("STRICT MISMATCHES:", len(bad))
for b in bad:
    print(" ", b[0], b[1], str(b[2])[:300], str(b[3])[:100])
spark.stop()
