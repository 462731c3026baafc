"""Round-close Spark-JVM hygiene gate (r16, VERDICT r15 item 3).

BENCH_r15's official record was contention-stamped: a builder probe JVM
(a local[8] permute-probe session) was still alive when the driver ran
the round-close bench, violating the repo's own no-concurrent-JVM
doctrine at the exact moment it matters most. The vm_quantum stamps and
retry ledger adjudicated it, but the right fix is prevention: this gate
makes a contended official bench impossible by asserting ZERO live
Spark JVMs on the machine before and after every check_all run, and by
reaping the one class of JVM that is always safe to kill.

Classification (same /proc cmdline scan bench.py's contention sentinel
uses — java argv0 + org.apache.spark in the cmdline, which catches
SparkSubmit/pyspark-shell gateways regardless of app name):

- ORPHAN GATEWAY (parent exited, ppid == 1, and the cmdline is a
  SparkSubmit/pyspark-shell gateway with NO daemon main class): an
  abandoned gateway from a crashed or interrupted python run. Nothing
  can be using it; --kill SIGTERMs it (then SIGKILL after a grace
  period if it ignores TERM).
- DAEMON (ADVICE r16: Master/Worker/HistoryServer/ThriftServer/shuffle
  service/executor backend class in the cmdline): daemonized services
  double-fork to ppid 1 BY DESIGN, so ppid==1 does not mean abandoned.
  Never killed — fail LOUD so the operator stops the service
  deliberately (a live daemon still contends the CPUs).
- LIVE-PARENT: some python process still owns it — killing could
  corrupt an in-flight run, and the contention doctrine says that run
  should not be sharing the machine with us in the first place. Fail
  LOUD naming pid, parent, and cmdline so the operator stops the owner
  deliberately.

Usage:
    python scripts/reap_spark_jvms.py          # assert none; exit 1 if any
    python scripts/reap_spark_jvms.py --kill   # reap orphan gateways, assert
    python scripts/reap_spark_jvms.py --wait 5 # re-scan up to 5 s before
                                               # failing (ADVICE r16: a py4j
                                               # gateway can outlive its
                                               # python driver by a moment
                                               # during teardown)

Exit 0 == the machine is Spark-quiet (the only state in which a bench
sample or a driver round-close is trustworthy).
"""

from __future__ import annotations

import os
import signal
import sys
import time

#: Main classes that mark a JVM as a long-running Spark SERVICE rather
#: than a py4j gateway. These daemonize to ppid 1 on purpose (sbin
#: scripts double-fork), so the orphan heuristic must never reap them
#: (ADVICE r16 item 1). Matched as bytes against the raw cmdline.
DAEMON_CLASSES = (
    b"org.apache.spark.deploy.master.Master",
    b"org.apache.spark.deploy.worker.Worker",
    b"org.apache.spark.deploy.history.HistoryServer",
    b"org.apache.spark.sql.hive.thriftserver.HiveThriftServer2",
    b"org.apache.spark.deploy.ExternalShuffleService",
    b"org.apache.spark.executor.CoarseGrainedExecutorBackend",
)


def spark_jvms(proc_root: str = "/proc") -> list[dict]:
    """Every live Spark JVM: [{pid, ppid, orphan, daemon, reapable,
    cmd}] — the same detection bench.py's contention sentinel uses,
    plus the classification the reaper needs. ``reapable`` is True only
    for ppid==1 NON-daemon gateways: a daemonized service reaches
    ppid 1 by double-forking, so it must fail loud, never be killed."""
    out: list[dict] = []
    try:
        entries = os.listdir(proc_root)
    except OSError:
        return out
    for entry in entries:
        if not entry.isdigit():
            continue
        try:
            with open(os.path.join(proc_root, entry, "cmdline"), "rb") as f:
                cmd = f.read()
        except OSError:
            continue  # exited mid-scan, or not ours to read
        argv0 = cmd.split(b"\0", 1)[0]
        if not (b"java" in argv0 and b"org.apache.spark" in cmd):
            continue
        try:
            with open(os.path.join(proc_root, entry, "stat")) as f:
                # field 4 is ppid; comm (field 2) is parenthesized and
                # may contain spaces — split after the closing paren
                ppid = int(f.read().rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            ppid = -1
        orphan = ppid == 1
        daemon = any(cls in cmd for cls in DAEMON_CLASSES)
        out.append(
            {
                "pid": int(entry),
                "ppid": ppid,
                "orphan": orphan,
                "daemon": daemon,
                "reapable": orphan and not daemon,
                "cmd": b" ".join(cmd.split(b"\0")).decode(
                    "utf-8", "replace"
                )[:160],
            }
        )
    return sorted(out, key=lambda j: j["pid"])


def reap_orphans(jvms: list[dict], grace: float = 5.0) -> list[int]:
    """SIGTERM every reapable (orphan, non-daemon) JVM, then poll the
    WHOLE set in one loop until the shared ``grace`` deadline and only
    then SIGKILL survivors (ADVICE r16 item 2: a per-pid sequential
    wait let the first stubborn pid consume the grace and every later
    orphan got KILLed with zero TERM window). Returns the reaped
    pids."""
    orphans = [j["pid"] for j in jvms if j["reapable"]]
    for pid in orphans:
        try:
            os.kill(pid, signal.SIGTERM)
        except ProcessLookupError:
            pass
    deadline = time.monotonic() + grace
    pending = set(orphans)
    while pending and time.monotonic() < deadline:
        for pid in list(pending):
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                pending.discard(pid)
        if pending:
            time.sleep(0.2)
    for pid in pending:
        try:
            os.kill(pid, signal.SIGKILL)
            print(f"reap_spark_jvms: pid {pid} ignored TERM — KILLed")
        except ProcessLookupError:
            pass
    return orphans


def main(argv: list[str]) -> int:
    kill = "--kill" in argv
    wait = 0.0
    if "--wait" in argv:
        try:
            wait = float(argv[argv.index("--wait") + 1])
        except (IndexError, ValueError):
            print("reap_spark_jvms: --wait needs seconds", file=sys.stderr)
            return 2
    jvms = spark_jvms()
    if kill:
        reaped = reap_orphans(jvms)
        for pid in reaped:
            print(f"reap_spark_jvms: reaped orphan Spark JVM pid {pid}")
        jvms = spark_jvms()
    # ADVICE r16 item 3: at round close a py4j gateway can outlive its
    # python driver by a moment during teardown — give the non-kill
    # assert a bounded re-scan window so only genuinely lingering JVMs
    # trip the gate.
    deadline = time.monotonic() + wait
    while jvms and time.monotonic() < deadline:
        time.sleep(0.5)
        jvms = spark_jvms()
    if not jvms:
        print("reap_spark_jvms: machine is Spark-quiet")
        return 0
    print(
        f"reap_spark_jvms: {len(jvms)} live Spark JVM(s) — a bench or "
        "round-close taken now would be CONTENDED (the BENCH_r15 "
        "failure mode). Stop the owning process(es) first:",
        file=sys.stderr,
    )
    for j in jvms:
        if j["daemon"]:
            kind = "DAEMON (never auto-killed)"
            if j["orphan"]:
                kind = "DAEMON, daemonized to ppid 1 (never auto-killed)"
        elif j["orphan"]:
            kind = "ORPHAN"
        else:
            kind = f"owned by ppid {j['ppid']}"
        print(
            f"  pid {j['pid']} ({kind}): {j['cmd']}",
            file=sys.stderr,
        )
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
