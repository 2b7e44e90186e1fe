#!/usr/bin/env python3
"""Self-audit leak scan with PROVENANCE (round-13 ADVICE: the
round-over-round LEAKCHECK.json was byte-identical except the round
field, so a re-run was indistinguishable from a relabel).

Scans the library surface (src/, tools/, build.sbt, project/) for
classes of strings that must never appear in a public-knowledge-only
engine: non-public package imports, non-public URLs, cloud bucket
URIs, chat-webhook links, credential-shaped strings, and
environment-variable reads outside the engine's own documented
SPARK_GRAFT_* / standard-JVM allowlist. Emits per-class hits PLUS a
UTC timestamp, the scanned-file count, and per-class probe counts —
so two runs are distinguishable artifacts.

Dev tooling only (like check.py) — the Scala library has no Python
dependency. The driver's own LEAKCHECK remains the gate of record;
this is the builder-side audit that makes a clean result self-
documenting.

    python3 tools/leakcheck.py            # scan, print JSON
    python3 tools/leakcheck.py --write    # also write LEAKCHECK_local.json
"""
import datetime
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCAN = ["src", "tools", "build.sbt", "project"]
EXTS = {".scala", ".py", ".sbt", ".md", ".json", ".properties"}

# public domains the engine may legitimately reference (scaladoc
# citations, Spark/DuckDB docs). Anchored at the domain boundary
# (r13 ADVICE: a prefix-only match whitelisted a lookalike host like
# github.com DOT evil DOT example) — the domain must be followed by
# end-of-match, a path slash, or a non-hostname character.
PUBLIC_URL_OK = re.compile(
    r"https?://(www\.)?("
    r"spark\.apache\.org|duckdb\.org|github\.com|arxiv\.org|"
    r"scala-lang\.org|openjdk\.org|docs\.oracle\.com|"
    r"en\.wikipedia\.org|repo1\.maven\.org|aclanthology\.org)"
    r"(/|$|[^\w.-])")

# env vars the engine documents (Bench/Verify/replay knobs) + standard
# MONGO_*: the RealServerSmoke tool's user-supplied server
# parameters, documented in README — generic connection knobs a user
# points at THEIR server, not references to any nonpublic system
ENV_OK = re.compile(
    r"SPARK_GRAFT_\w+|JAVA_HOME|PATH|HOME|TMPDIR|USER|LANG|TZ|"
    r"COURSIER_\w+|SBT_\w+|SPARK_\w+|MONGO_\w+")

PROBES = {
    "nonpublic-import": [
        # reverse-domain imports outside the known-public stacks
        # (lowercase local imports like `spark.implicits._` and the
        # engine's own `graft.*` never match the domain prefixes)
        re.compile(r"^\s*import\s+((?:com|net|io|ai|dev|cloud|co|us)\."
                   r"(?!fasterxml\.)[\w.]+)", re.M),
    ],
    "nonpublic-url": [re.compile(r"https?://[\w.-]+")],
    "bucket-uri": [re.compile(r"\b(s3a?|gs|abfss?|wasbs?)://[\w./-]+")],
    "chat-webhook": [re.compile(
        r"hooks\.slack\.com|slack\.com/archives|discord\.com/api/webhooks")],
    "credential": [
        re.compile(r"\bAKIA[0-9A-Z]{16}\b"),
        re.compile(r"\bsk-[A-Za-z0-9]{20,}\b"),
        re.compile(r"-----BEGIN [A-Z ]*PRIVATE KEY-----"),
    ],
    # covers the bare-apply, .get, .getOrElse, and .apply read forms of
    # sys.env (r13 ADVICE: getOrElse — the dominant form in Bench.scala
    # — previously escaped the audit), plus os.environ [...] / .get
    "env-read": [re.compile(
        r"sys\.env(?:\.(?:get|getOrElse|apply))?\s*\(\s*\"([A-Z0-9_]+)\"|"
        r"os\.environ(?:\.get)?[\[(]\"([A-Z0-9_]+)\"")],
}


def files():
    for top in SCAN:
        p = os.path.join(ROOT, top)
        if os.path.isfile(p):
            yield p
        else:
            for d, _, fs in os.walk(p):
                for f in fs:
                    if os.path.splitext(f)[1] in EXTS:
                        yield os.path.join(d, f)


def main():
    hits = {k: [] for k in PROBES}
    n_files = 0
    n_lines = 0
    for path in files():
        n_files += 1
        rel = os.path.relpath(path, ROOT)
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        lines = text.splitlines()
        n_lines += len(lines)
        for cls, pats in PROBES.items():
            for pat in pats:
                for mo in pat.finditer(text):
                    frag = mo.group(0)
                    if cls == "nonpublic-url" and PUBLIC_URL_OK.match(frag):
                        continue
                    if cls == "env-read":
                        var = mo.group(1) or mo.group(2) or ""
                        if ENV_OK.fullmatch(var):
                            continue
                        frag = var
                    ln = text.count("\n", 0, mo.start()) + 1
                    hits[cls].append(f"{rel}:{ln}: {frag[:80]}")
    out = {
        "generated_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "n_files_scanned": n_files,
        "n_lines_scanned": n_lines,
        "n_probe_classes": len(PROBES),
        "n_probes": sum(len(v) for v in PROBES.values()),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    print(json.dumps(out, indent=2))
    if "--write" in sys.argv:
        with open(os.path.join(ROOT, "LEAKCHECK_local.json"), "w") as f:
            json.dump(out, f, indent=2)
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
