
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
        // parse the zero-padded hex form Display emits
        pub fn parse_str(s: &str) -> Result<Uuid, String> {
            u128::from_str_radix(s.trim(), 16).map(Uuid).map_err(|e| e.to_string())
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
