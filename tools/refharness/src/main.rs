// Line-protocol REPL over the vendored reference query engine.
// Requests (one per line):
//   Q <query>                 -- execute_cypher
//   P <query>\x1f<k>=<v>\x1f... -- execute_cypher_with_params
//   RESET                     -- fresh database
// Response: one line per result row, then "OK" or "ERR <msg>".
//   node|<id>|<label>|k\x1fv\x1ek\x1fv
//   rel|<id>|<from>|<to>|<label>|k\x1fv\x1ek\x1fv
//   info|<s>
mod shim;
mod graph;
mod cypher_spec;
mod query_interface;

use std::collections::HashMap;
use std::io::{self, BufRead, Write};
use graph::GraphDatabase;
use query_interface::QueryResultRow;

// key and value are joined with \x1f, NOT '=': fuzz mutations can mint
// prop KEYS that themselves contain '=' (`{k=:"v"}` parses as key "k=",
// value "v" in the reference's legacy prop split), and a `k=v`-encoded
// pair is then ambiguous at the client's first-'=' split — seen live
// r11, MutFuzz seed 177, where the marker map mis-attributed the "k="
// prop to "k" and a harness-only "state diverged" appeared. \x1f can
// occur in neither keys nor values (it is consumed by the P-command
// param split on input and is outside every generator alphabet).
fn fmt_props(m: &HashMap<String, String>) -> String {
    let mut kv: Vec<String> = m.iter().map(|(k, v)| format!("{}\x1f{}", k, v)).collect();
    kv.sort();
    kv.join("\x1e")
}

fn main() {
    // reference panics (byte-window slices on multi-byte input) are part
    // of the adjudicated surface: surface them as ERR lines instead of
    // dying, so differential fuzz seeds survive them
    std::panic::set_hook(Box::new(|_| {}));
    let stdin = io::stdin();
    let stdout = io::stdout();
    let mut out = stdout.lock();
    let mut db = GraphDatabase::new();
    for line in stdin.lock().lines() {
        let line = match line { Ok(l) => l, Err(_) => break };
        if line == "RESET" { db = GraphDatabase::new(); writeln!(out, "OK").ok(); out.flush().ok(); continue; }
        let (query, params) = if let Some(rest) = line.strip_prefix("P ") {
            let mut parts = rest.split('\x1f');
            let q = parts.next().unwrap_or("").to_string();
            let mut ps = HashMap::new();
            for p in parts {
                if let Some(eq) = p.find('=') {
                    ps.insert(p[..eq].to_string(), p[eq + 1..].to_string());
                }
            }
            (q, ps)
        } else if let Some(rest) = line.strip_prefix("Q ") {
            (rest.to_string(), HashMap::new())
        } else {
            writeln!(out, "ERR bad request").ok(); out.flush().ok(); continue;
        };
        // \x1d encodes newlines inside multi-line statements
        let query = query.replace('\x1d', "\n");
        let res = std::panic::catch_unwind(std::panic::AssertUnwindSafe(|| {
            if params.is_empty() {
                query_interface::execute_query(&mut db, &query)
            } else {
                // params only exist on the raw Cypher path
                query_interface::execute_query_with_params(&mut db, &query, &params)
            }
        }));
        let res = match res {
            Ok(r) => r,
            Err(p) => {
                let msg = p.downcast_ref::<&str>().map(|s| s.to_string())
                    .or_else(|| p.downcast_ref::<String>().cloned())
                    .unwrap_or_else(|| "<non-string payload>".to_string());
                writeln!(out, "ERR panic: {}", msg.replace('\n', " ")).ok();
                out.flush().ok();
                continue;
            }
        };
        match res {
            Ok(o) => {
                writeln!(out, "meta|{}|{}|{}", o.affected_nodes, o.affected_relationships, o.mutated).ok();
                for r in o.rows {
                    match r {
                        QueryResultRow::Node { id, label, metadata } =>
                            writeln!(out, "node|{}|{}|{}", id, label, fmt_props(&metadata)).ok(),
                        QueryResultRow::Relationship { id, from, to, label, metadata } =>
                            writeln!(out, "rel|{}|{}|{}|{}|{}", id, from, to, label, fmt_props(&metadata)).ok(),
                        QueryResultRow::Info(s) =>
                            writeln!(out, "info|{}", s).ok(),
                    };
                }
                writeln!(out, "OK").ok();
            }
            Err(e) => { writeln!(out, "ERR {}", e).ok(); }
        }
        out.flush().ok();
    }
}
