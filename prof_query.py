#!/usr/bin/env python
"""Dev profiling: run one query with eventLog on, then print per-stage
wall/task time sorted desc.  Not part of the driver contract."""
import json, os, sys, time, glob
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.makedirs("/tmp/spark-events", exist_ok=True)
name = sys.argv[1]
repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 1

from linkkchecker_net_spark.session import build_session
import bench
spark = build_session(
    app_name=f"prof:{name}",
    cores=bench.CPUS,
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": "/tmp/spark-events",
        "spark.eventLog.compress": "false",
    },
)
app_id = spark.sparkContext.applicationId
import __spark_entry__ as em
qs = em.queries()
for r in range(repeat):
    t0 = time.monotonic()
    qs[name](spark, bench.SF_DIR).count()
    print(f"RUN{r}: {time.monotonic()-t0:.3f}s", flush=True)
spark.stop()

ev = f"/tmp/spark-events/{app_id}"
if not os.path.exists(ev):
    d = f"/tmp/spark-events/eventlog_v2_{app_id}"
    inner = sorted(glob.glob(os.path.join(d, "events_*")))
    assert inner, f"no event log for {app_id}"
    ev = inner[0]
stages = {}
jobs = {}
for line in open(ev):
    try:
        e = json.loads(line)
    except Exception:
        continue
    t = e.get("Event")
    if t == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        sid = si["Stage ID"]
        wall = (si.get("Completion Time",0)-si.get("Submission Time",0))/1000.0
        stages[sid] = dict(name=si["Stage Name"].split("\n")[0][:90],
                           wall=wall, tasks=si["Number of Tasks"])
    elif t == "SparkListenerJobStart":
        jobs[e["Job ID"]] = dict(t0=e["Submission Time"], stages=e["Stage IDs"],
                                 desc=e.get("Properties",{}).get("spark.job.description",""))
    elif t == "SparkListenerJobEnd":
        j = jobs.get(e["Job ID"])
        if j: j["wall"] = (e["Completion Time"]-j["t0"])/1000.0
print(f"== {len(jobs)} jobs, {len(stages)} stages ==")
print("top stages by wall:")
for sid, s in sorted(stages.items(), key=lambda kv:-kv[1]["wall"])[:15]:
    print(f"  stage {sid:4d} {s['wall']:7.3f}s  {s['tasks']:3d} tasks  {s['name']}")
jw = sorted(jobs.items(), key=lambda kv:-kv[1].get("wall",0))[:10]
print("top jobs by wall:")
for jid, j in jw:
    print(f"  job {jid:4d} {j.get('wall',0):7.3f}s  stages={j['stages']}")
print(f"total job wall: {sum(j.get('wall',0) for j in jobs.values()):.3f}s")
