"""Pure-Python utility layer: content parsing and translation helpers shared
by the DataSources. No Spark imports here — everything is unit-testable
without a session and usable inside executor-side reader code."""
