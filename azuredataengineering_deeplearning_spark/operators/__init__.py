"""Named DataFrame operators (SURVEY §2). All take/return DataFrames, lazily."""
