"""Environment-compatibility bridges (loud, opt-in, production no-ops)."""
