package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.control.ConfigXml

class ConfigXmlSpec extends AnyFunSuite {

  private def writeFixture(): String = {
    val xml = """<?xml version="1.0" encoding="UTF-8"?>
      <configuration>
        <databases>
          <database name="dw">
            <hostname>db.example.test</hostname>
            <port>5432</port>
            <database>dw_test</database>
            <username>svc</username>
            <password>file-fallback</password>
          </database>
          <database name="dm">
            <hostname>dm.example.test</hostname>
            <port>5433</port>
            <database>dm_test</database>
            <username>svc2</username>
            <password>other</password>
          </database>
        </databases>
        <backblaze>
          <key_id>kid</key_id>
          <key_name>kname</key_name>
          <application_key>file-key</application_key>
        </backblaze>
      </configuration>"""
    val f = java.nio.file.Files.createTempFile("config", ".xml")
    java.nio.file.Files.writeString(f, xml)
    f.toString
  }

  test("parses databases and store sections") {
    val cfg = ConfigXml.parse(writeFixture(), env = Map.empty)
    assert(cfg.databases.keySet === Set("dw", "dm"))
    val dw = cfg.databases("dw")
    assert(dw.hostname === "db.example.test" && dw.port === 5432 &&
      dw.database === "dw_test" && dw.username === "svc" &&
      dw.password === "file-fallback")
    assert(cfg.store.get.keyId === "kid")
  }

  test("environment overrides beat file-embedded secrets (B6 fix)") {
    val cfg = ConfigXml.parse(writeFixture(),
      env = Map("GRAFT_DB_PASSWORD" -> "from-env",
        "GRAFT_STORE_KEY" -> "env-key"))
    assert(cfg.databases("dw").password === "from-env")
    assert(cfg.store.get.applicationKey === "env-key")
  }

  test("per-database env secret beats the shared fallback") {
    val cfg = ConfigXml.parse(writeFixture(),
      env = Map(
        "GRAFT_DB_PASSWORD_DW" -> "dw-secret",
        "GRAFT_DB_PASSWORD" -> "shared"))
    assert(cfg.databases("dw").password === "dw-secret")
    // dm has no per-db var: shared fallback applies
    assert(cfg.databases("dm").password === "shared")
    // no env at all: XML value per database
    val bare = ConfigXml.parse(writeFixture(), env = Map.empty)
    assert(bare.databases("dm").password === "other")
  }
}
