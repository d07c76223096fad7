package graft

/** `spark.sql.extensions=graft.GraftExtensions` — the documented
  * cluster entry point. The implementation lives with the function
  * registry ([[graft.functions.GraftExtensions]]); this no-arg alias
  * keeps the documented class name loadable (the conf instantiates by
  * reflection, so a package mismatch only surfaces at cluster deploy
  * time — it did not bite the test suite, which registers directly).
  */
class GraftExtensions extends graft.functions.GraftExtensions
