package graft.meta

import java.sql.SQLException

import org.scalatest.funsuite.AnyFunSuite

/** Golden contract for the PostgreSQL dialect (reference `catalog/sql/
  * sql.go:34-60` — pg is the reference's primary production target).
  * No pg server exists in this container, so the live-lifecycle proof runs
  * the pg CLASSIFIERS against embedded Derby (SqlCatalogSpec via
  * `withAnsiBootstrap`); what that cannot pin is the literal DDL text and
  * the SQLSTATE table itself. This spec locks both against RECORDED
  * PostgreSQL behavior — the exact states/messages a pg 14+ server emits
  * (documented wire protocol, Appendix A of the pg manual) — so any edit
  * to the dialect that would break a real deployment fails here first.
  */
final class SqlDialectGoldenSpec extends AnyFunSuite {

  /** A recorded server error: SQLSTATE + the message shape pg emits. The
    * classifier contract is state-driven; messages document provenance.
    */
  private def pg(state: String, message: String): SQLException =
    new SQLException(message, state)

  test("golden: iceberg_tables bootstrap DDL is the standard JDBC-catalog layout") {
    // byte-exact golden strings: idempotent IF NOT EXISTS bootstrap with
    // the Iceberg JDBC-catalog column set and composite primary keys
    assert(SqlDialect.Postgres.catalogDdl == Seq(
      "CREATE TABLE IF NOT EXISTS iceberg_tables (" +
        "catalog_name VARCHAR(255) NOT NULL, " +
        "table_namespace VARCHAR(255) NOT NULL, " +
        "table_name VARCHAR(255) NOT NULL, " +
        "iceberg_type VARCHAR(8), " +
        "metadata_location VARCHAR(1000), " +
        "previous_metadata_location VARCHAR(1000), " +
        "PRIMARY KEY (catalog_name, table_namespace, table_name))",
      "CREATE TABLE IF NOT EXISTS iceberg_namespace_properties (" +
        "catalog_name VARCHAR(255) NOT NULL, " +
        "namespace VARCHAR(255) NOT NULL, " +
        "property_key VARCHAR(255) NOT NULL, " +
        "property_value VARCHAR(1000), " +
        "PRIMARY KEY (catalog_name, namespace, property_key))"))
  }

  test("golden: recorded pg duplicate-key errors classify as the create/commit race loser") {
    val d = SqlDialect.Postgres
    // unique_violation as pg raises it on the INSERT-wins create race
    assert(d.isDuplicateKey(pg("23505",
      "ERROR: duplicate key value violates unique constraint \"iceberg_tables_pkey\"")))
    // and on a namespace-properties race
    assert(d.isDuplicateKey(pg("23505",
      "ERROR: duplicate key value violates unique constraint " +
        "\"iceberg_namespace_properties_pkey\"")))
    // near-miss states must NOT classify: serialization_failure retries are
    // NOT a lost create race, FK violations are corruption, not racing
    assert(!d.isDuplicateKey(pg("40001",
      "ERROR: could not serialize access due to concurrent update")))
    assert(!d.isDuplicateKey(pg("23503",
      "ERROR: insert or update on table violates foreign key constraint")))
    assert(!d.isDuplicateKey(pg("42P07", "ERROR: relation already exists")))
  }

  test("golden: recorded pg bootstrap races classify as table-exists, others raise") {
    val d = SqlDialect.Postgres
    // duplicate_table from a plain CREATE TABLE race
    assert(d.isTableExists(pg("42P07",
      "ERROR: relation \"iceberg_tables\" already exists")))
    // two sessions racing CREATE TABLE IF NOT EXISTS: pg surfaces the
    // unique violation on the pg_class/pg_type catalog index instead
    assert(d.isTableExists(pg("23505",
      "ERROR: duplicate key value violates unique constraint \"pg_type_typname_nsp_index\"")))
    // anything else (permissions, syntax) must propagate, never be absorbed
    assert(!d.isTableExists(pg("42501",
      "ERROR: permission denied for schema public")))
    assert(!d.isTableExists(pg("42601", "ERROR: syntax error at or near")))
  }

  test("golden: JDBC URL scheme routing per sql.go dialect selection") {
    assert(SqlDialect.fromUrl("jdbc:postgresql://db:5432/iceberg") == SqlDialect.Postgres)
    assert(SqlDialect.fromUrl("jdbc:postgresql:iceberg") == SqlDialect.Postgres)
    assert(SqlDialect.fromUrl("jdbc:derby:/tmp/cat;create=true") == SqlDialect.Ansi)
    assert(SqlDialect.fromUrl("jdbc:mysql://db/iceberg") == SqlDialect.Ansi)
  }

  test("withAnsiBootstrap keeps pg classification, substitutes only the DDL Derby can parse") {
    val grafted = SqlDialect.withAnsiBootstrap(SqlDialect.Postgres)
    assert(grafted.catalogDdl == SqlDialect.Ansi.catalogDdl)
    // pg classification preserved verbatim…
    assert(grafted.isDuplicateKey(pg("23505", "ERROR: duplicate key")))
    assert(grafted.isTableExists(pg("42P07", "ERROR: relation exists")))
    // …plus the ANSI existence states its own DDL can raise on re-open
    assert(grafted.isTableExists(pg("X0Y32",
      "Table/View 'ICEBERG_TABLES' already exists in Schema 'APP'.")))
  }
}
