#!/usr/bin/env python3
"""Derive the refharness's vendored reference sources.

The harness wraps the reference's OWN Rust executor (cypher_spec.rs,
query_interface.rs, graph.rs) behind a line-protocol REPL so the Scala
engine can be differentially fuzzed against it (graft.DiffFuzz /
graft.MutFuzz with GRAFT_REF_ORACLE set). The reference sources are NOT
committed to this repo — this script copies them from the read-only
reference checkout at build time and applies the minimal edits needed
for an offline, dependency-free build:

  * uuid / anyhow crate imports -> the committed shim (src/shim.rs)
  * module paths flattened (no graph_utils/gql hierarchy here)
  * the file-logging machinery (log_query & friends) and serde derives
    removed — they pull in the time/serde crates and touch the
    filesystem, neither of which the oracle protocol needs

Every edit is anchored on exact source text and FAILS LOUDLY if the
reference doesn't match, so a silently-different reference can never
produce a silently-different oracle.
"""
import re
import sys
from pathlib import Path

REF = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
OUT = Path(__file__).resolve().parent / "src"


def must_sub(text: str, old: str, new: str, path: str) -> str:
    if old not in text:
        sys.exit(f"prepare.py: anchor not found in {path!r}: {old!r}")
    return text.replace(old, new, 1)


def drop_fn(text: str, sig: str, path: str) -> str:
    """Remove a top-level fn by brace counting from its signature line."""
    i = text.find(sig)
    if i < 0:
        sys.exit(f"prepare.py: fn anchor not found in {path!r}: {sig!r}")
    j = text.index("{", i)
    depth = 0
    while j < len(text):
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
            if depth == 0:
                break
        j += 1
    return text[:i] + text[j + 1:]


def cypher_spec() -> None:
    p = REF / "src/gql/cypher_spec.rs"
    t = p.read_text()
    t = must_sub(t, "use anyhow::{anyhow, Result};",
                 "use crate::shim::anyhow::{anyhow, Result};", p.name)
    t = must_sub(t, "use uuid::Uuid;", "use crate::shim::uuid::Uuid;", p.name)
    t = must_sub(t, "use crate::graph_utils::graph::{GraphDatabase, Node, Relationship};",
                 "use crate::graph::{GraphDatabase, Node, Relationship};", p.name)
    t = must_sub(t, "use super::query_interface::QueryResultRow;",
                 "use crate::query_interface::QueryResultRow;", p.name)
    (OUT / "cypher_spec.rs").write_text(t)


def query_interface() -> None:
    p = REF / "src/gql/query_interface.rs"
    t = p.read_text()
    t = must_sub(t, "use anyhow::{anyhow, Result};",
                 "use crate::shim::anyhow::{anyhow, Result};", p.name)
    t = must_sub(t, """use std::fs::{create_dir_all, OpenOptions};
use std::io::Write;
use std::path::PathBuf;
use time::{macros::format_description, OffsetDateTime};
use uuid::Uuid;""", "use crate::shim::uuid::Uuid;", p.name)
    t = must_sub(t, "use crate::graph_utils::graph::{GraphDatabase, NodeId};",
                 "use crate::graph::{GraphDatabase, NodeId};", p.name)
    t = must_sub(t, "use super::cypher_spec::{execute_cypher, execute_cypher_with_params};",
                 "use crate::cypher_spec::{execute_cypher, execute_cypher_with_params};", p.name)
    t = drop_fn(t, "fn log_path_for_now()", p.name)
    t = drop_fn(t, "fn log_query(", p.name)
    t = drop_fn(t, "fn _split_statements(", p.name)
    # the two log_query call sites inside execute_and_log(_with_params)
    n = t.count("    log_query(query, &res);\n")
    if n != 2:
        sys.exit(f"prepare.py: expected 2 log_query call sites, found {n}")
    t = t.replace("    log_query(query, &res);\n", "")
    (OUT / "query_interface.rs").write_text(t)


def graph() -> None:
    p = REF / "src/graph_utils/graph.rs"
    t = p.read_text()
    t = must_sub(t, "use uuid::Uuid;\nuse serde::{Serialize, Deserialize};",
                 "use crate::shim::uuid::Uuid;", p.name)
    n = t.count("#[derive(Clone, Debug, Serialize, Deserialize)]")
    if n != 3:
        sys.exit(f"prepare.py: expected 3 serde derives, found {n}")
    t = t.replace("#[derive(Clone, Debug, Serialize, Deserialize)]",
                  "#[derive(Clone, Debug)]")
    (OUT / "graph.rs").write_text(t)


if __name__ == "__main__":
    if not REF.is_dir():
        sys.exit(f"prepare.py: reference checkout not found at {REF}")
    cypher_spec()
    query_interface()
    graph()
    print(f"prepare.py: wrote cypher_spec.rs query_interface.rs graph.rs to {OUT}")
