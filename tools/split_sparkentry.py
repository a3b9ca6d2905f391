#!/usr/bin/env python3
"""One-shot refactor: split the 11k-line SparkEntry.scala registry into
per-shard objects (r11 verdict ask #8). Entries are moved VERBATIM;
SparkEntry composes the shards. Dev tool only."""
import re, sys

SRC = "src/main/scala/graft/SparkEntry.scala"
lines = open(SRC).read().split("\n")  # 0-indexed


def line_states(lines):
    """For each line: (in_triple_at_start, paren_depth_at_start).
    Paren depth counts ()[] outside strings/comments."""
    states = []
    in_triple = False
    depth = 0
    for ln in lines:
        states.append((in_triple, depth))
        i = 0
        in_str = False
        in_chr = False
        while i < len(ln):
            c = ln[i]
            if in_triple:
                if ln.startswith('"""', i):
                    # count run of quotes; triple ends at last 3
                    j = i
                    while j < len(ln) and ln[j] == '"':
                        j += 1
                    in_triple = False
                    i = j
                    continue
                i += 1
                continue
            if in_str:
                if c == "\\":
                    i += 2
                    continue
                if c == '"':
                    in_str = False
                i += 1
                continue
            if in_chr:
                if c == "\\":
                    i += 2
                    continue
                if c == "'":
                    in_chr = False
                i += 1
                continue
            if ln.startswith('"""', i):
                in_triple = True
                i += 3
                continue
            if c == '"':
                in_str = True
                i += 1
                continue
            if c == "'" and i + 2 < len(ln) and (ln[i + 1] == "\\" or ln[i + 2] == "'"):
                in_chr = True
                i += 1
                continue
            if ln.startswith("//", i):
                break
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            i += 1
        if in_str:
            in_str = False  # malformed; strings don't span lines
    return states


states = line_states(lines)


def find_line(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i], i):
            return i
    raise SystemExit("not found")


q_start = find_line(lambda l, i: l.startswith("  def queries:"))
q_end = find_line(lambda l, i: l == "  )" and not states[i][0] and states[i][1] == 1, q_start)
o_def = find_line(lambda l, i: l.startswith("  def oracleSql:"), q_end)
o_base = find_line(lambda l, i: l.strip() == "val base = Map(", o_def)
o_end = find_line(lambda l, i: l == "    )" and not states[i][0] and states[i][1] == 1, o_base)
o_close = find_line(lambda l, i: l == "  }", o_end)

print(f"queries map: {q_start+1}..{q_end+1}")
print(f"oracle def: {o_def+1}, base map: {o_base+1}..{o_end+1}, def end: {o_close+1}")

# ---- entry boundaries -------------------------------------------------
def entry_starts(lo, hi, indent, base_depth):
    pat = re.compile(r'^ {%d}"[a-z0-9_]+" ->' % indent)
    out = []
    for i in range(lo, hi):
        if pat.match(lines[i]) and not states[i][0] and states[i][1] == base_depth:
            out.append(i)
    return out


def back_over_comments(i, indent):
    while i > 0 and re.match(r"^ {%d}//" % indent, lines[i - 1]):
        i -= 1
    return i


def chunk(lo, hi, starts, n_chunks, indent):
    """Split [lo, hi) into n_chunks at entry starts (comments stick to
    the entry below)."""
    total = hi - lo
    bounds = [lo]
    for k in range(1, n_chunks):
        target = lo + total * k // n_chunks
        cand = min((s for s in starts if s >= target), default=None)
        if cand is None or cand >= hi:
            break
        cand = back_over_comments(cand, indent)
        if cand > bounds[-1]:
            bounds.append(cand)
    bounds.append(hi)
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


q_entry_lines = entry_starts(q_start + 1, q_end, 4, 1)
o_entry_lines = entry_starts(o_base + 1, o_end, 6, 1)
print(f"query entries: {len(q_entry_lines)}, oracle entries: {len(o_entry_lines)}")

q_chunks = chunk(q_start + 1, q_end, q_entry_lines, 5, 4)
o_chunks = chunk(o_base + 1, o_end, o_entry_lines, 6, 6)

HEADER = """package graft

import graft.operators._
import graft.pipeline.{Analytics, Dag, DayReplay, IncrementalModel, Models, Schedule}
import graft.sources.SchemaEvolution
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.EntryHelpers._
"""

for n, (lo, hi) in enumerate(q_chunks, 1):
    body = "\n".join(lines[lo:hi]).rstrip()
    if not body.endswith(","):
        body += ","
    with open(f"src/main/scala/graft/registry/QueriesShard{n}.scala", "w") as f:
        f.write(
            HEADER
            + f"""
/** Query-registry shard {n}/{len(q_chunks)} — split out of the 11k-line
  * SparkEntry (r11 verdict ask #8). Entries are VERBATIM (wave order
  * preserved); [[SparkEntry.queries]] composes the shards. */
private[graft] object QueriesShard{n} {{
  val m: Map[String, (SparkSession, String) => DataFrame] = Map(
{body}
  )
}}
"""
        )

# ---- oracle fragments -------------------------------------------------
frag_lines = lines[q_end + 1 : o_def]  # the private SQL helpers
local_lines = lines[o_def + 1 : o_base]  # oracleSql's local fragments
frag = "\n".join(
    re.sub(r"^(  )private ", r"\1", l) for l in frag_lines
).strip("\n")
loc = "\n".join(local_lines).rstrip()
with open("src/main/scala/graft/registry/OracleFragments.scala", "w") as f:
    f.write(
        f"""package graft

/** Shared DuckDB SQL fragments and generators for the oracle shards —
  * split out of SparkEntry (r11 verdict ask #8), bodies verbatim. */
private[graft] object OracleFragments {{
{frag}

{loc}
}}
"""
    )

for n, (lo, hi) in enumerate(o_chunks, 1):
    body = "\n".join(lines[lo:hi]).rstrip()
    if not body.endswith(","):
        body += ","
    with open(f"src/main/scala/graft/registry/OraclesShard{n}.scala", "w") as f:
        f.write(
            f"""package graft

import graft.OracleFragments._

/** Oracle-registry shard {n}/{len(o_chunks)} — split out of SparkEntry
  * (r11 verdict ask #8). DuckDB SQL VERBATIM; [[SparkEntry.oracleSql]]
  * composes the shards. */
private[graft] object OraclesShard{n} {{
  val m: Map[String, String] = Map(
{body}
  )
}}
"""
        )

# ---- EntryHelpers -----------------------------------------------------
helper_lines = lines[15 + 5 : q_start]  # after entry def, before queries
# locate: from the CdcCutoff comment to the line before `def queries`
h_lo = find_line(lambda l, i: "CdcCutoff" in l, 0) - 1
helpers = "\n".join(
    re.sub(r"^(  )private ", r"\1", l) for l in lines[h_lo:q_start]
).rstrip()
with open("src/main/scala/graft/registry/EntryHelpers.scala", "w") as f:
    f.write(
        f"""package graft

import graft.pipeline.Analytics
import org.apache.spark.sql.{{DataFrame, SparkSession}}
import org.apache.spark.sql.functions._

/** Shared plumbing for the query-registry shards — split out of
  * SparkEntry (r11 verdict ask #8), bodies verbatim. */
private[graft] object EntryHelpers {{
{helpers}
}}
"""
    )

# ---- new SparkEntry ---------------------------------------------------
head = "\n".join(lines[:15])  # package..object SparkEntry {
entry_def = "\n".join(lines[15 : h_lo]).rstrip()
tail = "\n".join(lines[o_end + 1 : o_close]).rstrip()
qs = " ++ ".join(f"QueriesShard{n}.m" for n in range(1, len(q_chunks) + 1))
os_ = " ++\n      ".join(
    f"OraclesShard{n}.m" for n in range(1, len(o_chunks) + 1)
)
with open(SRC, "w") as f:
    f.write(
        f"""{head}
{entry_def}

  /** Composed from the registry shards (r11 verdict ask #8: the
    * 11k-line single-file registry was a bad-merge hazard). Shards
    * hold the entries verbatim in wave order; keys are disjoint by
    * construction (AssemblySpec asserts the count). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    {qs}

  def oracleSql: Map[String, String] = {{
    val base =
      {os_}
{tail}
  }}
}}
"""
    )
print("done")
