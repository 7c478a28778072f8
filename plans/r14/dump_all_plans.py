import os, sys
sys.path.insert(0, "/root/repo")
import bench
import __spark_entry__ as entrymod
from shaper_spark.session import get_spark, register_sf_tables

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("plandump_all", cpus=32)
register_sf_tables(spark, sf_dir)
queries = entrymod.queries()
outdir = "/tmp/allplans"
os.makedirs(outdir, exist_ok=True)
for name in bench.HEADLINE + bench.EXTRAS:
    fn = queries.get(name)
    if fn is None:
        continue
    try:
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception as ex:
        plan = f"ERROR: {ex}"
    with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
        f.write(plan)
print("done", len(os.listdir(outdir)))
