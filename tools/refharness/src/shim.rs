
// Minimal shims replacing the uuid and anyhow crates (offline build).
pub mod uuid {
    use std::fmt;
    use std::sync::atomic::{AtomicU64, Ordering};
    static COUNTER: AtomicU64 = AtomicU64::new(1);
    #[derive(Clone, Copy, PartialEq, Eq, Hash, Debug, PartialOrd, Ord)]
    pub struct Uuid(pub u128);
    impl Uuid {
        // deterministic, strictly increasing — preserves now_v7's
        // creation-order property that id() comparisons rely on
        pub fn now_v7() -> Uuid {
            Uuid(COUNTER.fetch_add(1, Ordering::SeqCst) as u128)
        }
        pub fn as_u128(&self) -> u128 { self.0 }
        // Mirror of uuid 1.x try_parse's length dispatch (the real
        // crate the reference links): simple 32-hex, hyphenated
        // 8-4-4-4-12, braced {hyphenated} (the inner form must be
        // hyphenated), urn:uuid:hyphenated. The crate's parser.rs
        // pattern-matches the urn prefix as LITERAL LOWERCASE bytes
        // ([b'u', b'r', b'n', b':', b'u', b'u', b'i', b'd', b':',
        // s @ ..]) — so URN:UUID: is rejected; hex digits themselves
        // are case-insensitive via its HEX_TABLE. (r11: the earlier
        // eq_ignore_ascii_case prefix here was wrong; no offline build
        // of the real crate exists in this container, so this pins the
        // crate source's match arm rather than a probe.)
        pub fn parse_str(s: &str) -> Result<Uuid, String> {
            fn hex32(h: &str) -> Option<u128> {
                if h.len() == 32 && h.bytes().all(|b| b.is_ascii_hexdigit()) {
                    u128::from_str_radix(h, 16).ok()
                } else { None }
            }
            fn hyphenated(h: &str) -> Option<u128> {
                let b = h.as_bytes();
                if h.len() != 36 || b[8] != b'-' || b[13] != b'-'
                    || b[18] != b'-' || b[23] != b'-' { return None; }
                let compact: String =
                    h.chars().filter(|&c| c != '-').collect();
                hex32(&compact)
            }
            // no trim: the real try_parse dispatches on the exact input
            // length; the one reference call site that trims
            // (parse_uuid_from) does so itself before calling here
            let v = if s.len() == 32 { hex32(s) }
                else if s.len() == 36 { hyphenated(s) }
                else if s.len() == 38 && s.starts_with('{') && s.ends_with('}') {
                    s.get(1..37).and_then(hyphenated)
                }
                else if s.len() == 45 && s.starts_with("urn:uuid:") {
                    s.get(9..).and_then(hyphenated)
                }
                else { None };
            v.map(Uuid).ok_or_else(|| format!("invalid uuid: {}", s))
        }
    }
    impl fmt::Display for Uuid {
        fn fmt(&self, f: &mut fmt::Formatter<'_>) -> fmt::Result {
            // canonical-width hex so string order == numeric order
            write!(f, "{:032x}", self.0)
        }
    }
}
pub mod anyhow {
    pub type Result<T> = std::result::Result<T, String>;
    #[macro_export]
    macro_rules! anyhow { ($($arg:tt)*) => { format!($($arg)*) } }
    pub use crate::anyhow;
}
