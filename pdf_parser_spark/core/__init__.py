"""Pure-Python extraction semantics shared by Spark UDFs and the test oracle."""
