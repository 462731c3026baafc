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

- ORPHAN (parent exited, ppid == 1): an abandoned gateway from a
  crashed or interrupted python run. Nothing can be using it; --kill
  SIGTERMs it (then SIGKILL after a grace period if it ignores TERM).
- LIVE-PARENT: some python process still owns it — killing could
  corrupt an in-flight run, and the contention doctrine says that run
  should not be sharing the machine with us in the first place. Fail
  LOUD naming pid, parent, and cmdline so the operator stops the owner
  deliberately.

Usage:
    python scripts/reap_spark_jvms.py          # assert none; exit 1 if any
    python scripts/reap_spark_jvms.py --kill   # reap orphans, then assert

Exit 0 == the machine is Spark-quiet (the only state in which a bench
sample or a driver round-close is trustworthy).
"""

from __future__ import annotations

import os
import signal
import sys
import time


def spark_jvms(proc_root: str = "/proc") -> list[dict]:
    """Every live Spark JVM: [{pid, ppid, orphan, cmd}] — the same
    detection bench.py's contention sentinel uses, plus the ppid-based
    orphan classification the reaper needs."""
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
        out.append(
            {
                "pid": int(entry),
                "ppid": ppid,
                "orphan": ppid == 1,
                "cmd": b" ".join(cmd.split(b"\0")).decode(
                    "utf-8", "replace"
                )[:160],
            }
        )
    return sorted(out, key=lambda j: j["pid"])


def reap_orphans(jvms: list[dict], grace: float = 5.0) -> list[int]:
    """SIGTERM every orphan JVM, escalate to SIGKILL after ``grace``
    seconds for any that ignore TERM. Returns the reaped pids."""
    orphans = [j["pid"] for j in jvms if j["orphan"]]
    for pid in orphans:
        try:
            os.kill(pid, signal.SIGTERM)
        except ProcessLookupError:
            pass
    deadline = time.monotonic() + grace
    for pid in orphans:
        while time.monotonic() < deadline:
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                break
            time.sleep(0.2)
        else:
            try:
                os.kill(pid, signal.SIGKILL)
                print(f"reap_spark_jvms: pid {pid} ignored TERM — KILLed")
            except ProcessLookupError:
                pass
    return orphans


def main(argv: list[str]) -> int:
    kill = "--kill" in argv
    jvms = spark_jvms()
    if kill:
        reaped = reap_orphans(jvms)
        for pid in reaped:
            print(f"reap_spark_jvms: reaped orphan Spark JVM pid {pid}")
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
        kind = "ORPHAN" if j["orphan"] else f"owned by ppid {j['ppid']}"
        print(
            f"  pid {j['pid']} ({kind}): {j['cmd']}",
            file=sys.stderr,
        )
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
