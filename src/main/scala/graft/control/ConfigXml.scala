package graft.control

import scala.xml.XML

/** C6 — XML configuration parsing (`extract_file.py:147-173`, identical
  * copies in the other two scripts; shape of `config.xml`).
  *
  * The reference hardcodes DB and object-store credentials in the
  * committed XML (SURVEY B6). Here secrets resolve from the environment
  * first and the XML value is only a fallback for local development.
  * Database passwords are keyed per database —
  * `GRAFT_DB_PASSWORD_<NAME>` (name uppercased, non-alphanumerics →
  * `_`) — because the reference config carries distinct credentials per
  * DB; the unsuffixed `GRAFT_DB_PASSWORD` remains a shared fallback.
  * Object-store key: `GRAFT_STORE_KEY`.
  */
object ConfigXml {

  final case class DbConfig(name: String, hostname: String, port: Int,
                            database: String, username: String,
                            password: String)

  final case class StoreConfig(keyId: String, keyName: String,
                               applicationKey: String)

  final case class AppConfig(databases: Map[String, DbConfig],
                             store: Option[StoreConfig])

  def parse(path: String,
            env: Map[String, String] = sys.env): AppConfig = {
    val root = XML.loadFile(path)
    val dbs = (root \ "databases" \ "database").map { db =>
      val name = (db \@ "name")
      val perDbKey =
        "GRAFT_DB_PASSWORD_" + name.toUpperCase.replaceAll("[^A-Z0-9]", "_")
      name -> DbConfig(
        name = name,
        hostname = (db \ "hostname").text.trim,
        port = (db \ "port").text.trim.toInt,
        database = (db \ "database").text.trim,
        username = (db \ "username").text.trim,
        password = env.get(perDbKey)
          .orElse(env.get("GRAFT_DB_PASSWORD"))
          .getOrElse((db \ "password").text.trim))
    }.toMap
    val store = (root \ "backblaze").headOption.map { b =>
      StoreConfig(
        keyId = (b \ "key_id").text.trim,
        keyName = (b \ "key_name").text.trim,
        applicationKey = env.getOrElse("GRAFT_STORE_KEY",
          (b \ "application_key").text.trim))
    }
    AppConfig(dbs, store)
  }
}
