package graft.catalog

import java.lang.reflect.{InvocationHandler, Method, Proxy}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.metastore.api._
import org.apache.thrift.protocol.TBinaryProtocol
import org.apache.thrift.server.{TServer, TThreadPoolServer}
import org.apache.thrift.transport.{TServerSocket, TSocket}

/** Embedded metastore speaking the REAL `ThriftHiveMetastore` wire
  * protocol (libthrift TBinaryProtocol over a socket) with an in-memory
  * object store — the testable slice of an HMS deployment: every byte
  * `HmsCatalog` sends crosses an actual thrift client/server boundary,
  * only the Derby/DataNucleus persistence is replaced by maps. Implements
  * the operation subset the Iceberg-on-Hive protocol uses: database +
  * table CRUD, `alter_table`, and the table LOCK API (queued exclusive
  * locks with WAITING → ACQUIRED promotion) that brackets commits. */
final class HmsStubMetastore {

  private val databases = new java.util.concurrent.ConcurrentHashMap[String, Database]()
  private val tables = new java.util.concurrent.ConcurrentHashMap[(String, String), Table]()

  /** Queued exclusive table locks (lock → WAITING until the holder
    * unlocks; check_lock polls — the HMS contract iceberg-hive relies on). */
  private object locks {
    private val held = mutable.Map[String, Long]()
    private val queues = mutable.Map[String, mutable.Queue[Long]]()
    private val keyOf = mutable.Map[Long, String]()
    private var nextId = 1L

    def lock(key: String): (Long, LockState) = synchronized {
      val id = nextId; nextId += 1
      keyOf(id) = key
      if (held.contains(key)) {
        queues.getOrElseUpdate(key, mutable.Queue()) += id
        (id, LockState.WAITING)
      } else {
        held(key) = id
        (id, LockState.ACQUIRED)
      }
    }

    def check(id: Long): LockState = synchronized {
      keyOf.get(id) match {
        case Some(key) if held.get(key).contains(id) => LockState.ACQUIRED
        case Some(_) => LockState.WAITING
        case None => LockState.NOT_ACQUIRED
      }
    }

    def unlock(id: Long): Unit = synchronized {
      keyOf.remove(id).foreach { key =>
        if (held.get(key).contains(id)) {
          held.remove(key)
          queues.get(key).flatMap(q =>
            if (q.nonEmpty) Some(q.dequeue()) else None)
            .foreach(next => held(key) = next)
        } else queues.get(key).foreach(_.filterInPlace(_ != id))
      }
    }
  }

  private val handler = new InvocationHandler {
    override def invoke(proxy: Any, method: Method, args: Array[AnyRef]): AnyRef =
      method.getName match {
        case "create_database" =>
          val d = args(0).asInstanceOf[Database]
          if (databases.putIfAbsent(d.getName, d.deepCopy()) != null)
            throw new AlreadyExistsException(s"database exists: ${d.getName}")
          null
        case "get_database" =>
          Option(databases.get(args(0).asInstanceOf[String]))
            .map(_.deepCopy())
            .getOrElse(throw new NoSuchObjectException(s"no database: ${args(0)}"))
        case "create_table" =>
          val t = args(0).asInstanceOf[Table]
          if (!databases.containsKey(t.getDbName))
            throw new NoSuchObjectException(s"no database: ${t.getDbName}")
          if (tables.putIfAbsent((t.getDbName, t.getTableName), t.deepCopy()) != null)
            throw new AlreadyExistsException(s"table exists: ${t.getTableName}")
          null
        case "get_table" =>
          Option(tables.get((args(0).asInstanceOf[String], args(1).asInstanceOf[String])))
            .map(_.deepCopy())
            .getOrElse(throw new NoSuchObjectException(s"no table: ${args(1)}"))
        case "alter_table" =>
          val (db, name) = (args(0).asInstanceOf[String], args(1).asInstanceOf[String])
          val newT = args(2).asInstanceOf[Table].deepCopy()
          // real HMS moves the binding when the new table object carries a
          // different name (the Iceberg rename path)
          tables.synchronized {
            if (!tables.containsKey((db, name)))
              throw new InvalidOperationException(s"no table: $name")
            val newKey = (newT.getDbName, newT.getTableName)
            if (newKey != ((db, name)) && tables.containsKey(newKey))
              throw new InvalidOperationException(
                s"table exists: ${newT.getTableName}")
            if (newKey != ((db, name))) tables.remove((db, name))
            tables.put(newKey, newT)
          }
          null
        case "drop_table" =>
          val (db, name) = (args(0).asInstanceOf[String], args(1).asInstanceOf[String])
          if (tables.remove((db, name)) == null)
            throw new NoSuchObjectException(s"no table: $name")
          null
        case "get_all_tables" =>
          val db = args(0).asInstanceOf[String]
          tables.keySet().asScala.toSeq.collect { case (d, t) if d == db => t }
            .sorted.asJava
        case "lock" =>
          val req = args(0).asInstanceOf[LockRequest]
          val c = req.getComponent.get(0)
          val (id, state) = locks.lock(s"${c.getDbname}.${c.getTablename}")
          new LockResponse(id, state)
        case "check_lock" =>
          val id = args(0).asInstanceOf[CheckLockRequest].getLockid
          new LockResponse(id, locks.check(id))
        case "unlock" =>
          locks.unlock(args(0).asInstanceOf[UnlockRequest].getLockid)
          null
        case other =>
          throw new UnsupportedOperationException(s"stub metastore: $other")
      }
  }

  /** In-process Iface (no socket) — direct calls for tools/tests. */
  val iface: ThriftHiveMetastore.Iface = Proxy.newProxyInstance(
    getClass.getClassLoader, Array(classOf[ThriftHiveMetastore.Iface]), handler)
    .asInstanceOf[ThriftHiveMetastore.Iface]

  private var server: TServer = _
  private var serverSocket: TServerSocket = _
  private var thread: Thread = _

  /** Start the thrift server on an ephemeral port; returns the port. */
  def start(): Int = {
    serverSocket = new TServerSocket(0)
    server = new TThreadPoolServer(
      new TThreadPoolServer.Args(serverSocket)
        .processor(new ThriftHiveMetastore.Processor(iface))
        .protocolFactory(new TBinaryProtocol.Factory()))
    thread = new Thread(() => server.serve(), "hms-stub")
    thread.setDaemon(true)
    thread.start()
    port
  }

  def port: Int = serverSocket.getServerSocket.getLocalPort

  /** A connected thrift CLIENT to this server — the real wire path. */
  def connect(): ThriftHiveMetastore.Iface = {
    val sock = new TSocket("127.0.0.1", port)
    sock.open()
    new ThriftHiveMetastore.Client(new TBinaryProtocol(sock))
  }

  def stop(): Unit = if (server != null) server.stop()
}
