use std::collections::HashMap;
use crate::shim::uuid::Uuid;
use crate::graph::NodeId;

#[derive(Clone, Debug)]
pub enum QueryResultRow {
    Node { id: NodeId, label: String, metadata: HashMap<String, String> },
    Relationship { id: Uuid, from: NodeId, to: NodeId, label: String, metadata: HashMap<String, String> },
    #[allow(dead_code)]
    Info(String),
}
