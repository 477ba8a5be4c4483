package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java.{UDF1, UDF2}
import org.apache.spark.sql.types._

/** Register a Hive-UDF-contract class (`evaluate(...)` method, the
  * `org.apache.hadoop.hive.ql.exec.UDF` convention) as a named SQL
  * function — the reference's jar-shipped registration form (ref:
  * windowed_lagN_awskms_postgres_date_partition.py:61-64:
  * `create temporary function geog_ip_ext as 'com.acme...GeogIPExt'`,
  * guarded by a SHOW FUNCTIONS existence check).
  *
  * The SQL DDL form needs a Hive session catalog; this registrar is the
  * catalog-neutral equivalent: reflectively load the class (optionally
  * from an explicit jar path — the `sc.addJar` route), map its
  * `evaluate` signature to a typed Spark UDF, and register under the
  * given name, idempotently. The function is then usable from any SQL
  * string exactly like the DDL-registered original. The class is
  * re-resolved lazily on each executor (wrappers serialize only the
  * class NAME), matching how a jar-shipped Hive UDF instantiates
  * per-task.
  *
  * Boxed parameter types only (String/Integer/Long/Double/Boolean) —
  * the Hive convention; a primitive `evaluate(int)` would NPE on null
  * input in Hive too.
  */
object HiveUdfRegistrar {

  private def sparkType(c: Class[_]): DataType = c match {
    case x if x == classOf[String] => StringType
    case x if x == java.lang.Integer.TYPE || x == classOf[java.lang.Integer] => IntegerType
    case x if x == java.lang.Long.TYPE || x == classOf[java.lang.Long] => LongType
    case x if x == java.lang.Double.TYPE || x == classOf[java.lang.Double] => DoubleType
    case x if x == java.lang.Boolean.TYPE || x == classOf[java.lang.Boolean] => BooleanType
    case x => throw new IllegalArgumentException(
      s"unsupported evaluate() return type $x (use String/Integer/Long/Double/Boolean)")
  }

  private def loadClass(className: String, jarPath: Option[String]): Class[_] = {
    val parent = Thread.currentThread().getContextClassLoader
    val loader = jarPath match {
      case Some(p) => new java.net.URLClassLoader(
        Array(new java.io.File(p).toURI.toURL), parent)
      case None => parent
    }
    Class.forName(className, true, loader)
  }

  private def evaluateMethod(cls: Class[_], arity: Int): java.lang.reflect.Method =
    cls.getMethods.find(m => m.getName == "evaluate" && m.getParameterCount == arity)
      .getOrElse(throw new IllegalArgumentException(
        s"${cls.getName} has no evaluate() with $arity parameter(s)"))

  private class Reflect1(className: String, jar: Option[String])
      extends UDF1[AnyRef, AnyRef] with Serializable {
    @transient private lazy val inst =
      loadClass(className, jar).getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    @transient private lazy val m = evaluateMethod(inst.getClass, 1)
    override def call(a: AnyRef): AnyRef = m.invoke(inst, a)
  }

  private class Reflect2(className: String, jar: Option[String])
      extends UDF2[AnyRef, AnyRef, AnyRef] with Serializable {
    @transient private lazy val inst =
      loadClass(className, jar).getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    @transient private lazy val m = evaluateMethod(inst.getClass, 2)
    override def call(a: AnyRef, b: AnyRef): AnyRef = m.invoke(inst, a, b)
  }

  /** Register `className`'s evaluate() under `name` unless a function of
    * that name already exists (the reference's SHOW FUNCTIONS guard). */
  def registerIfAbsent(spark: SparkSession, name: String, className: String,
                       jarPath: Option[String] = None): Unit = {
    if (spark.catalog.functionExists(name)) return
    jarPath.foreach(spark.sparkContext.addJar)
    val cls = loadClass(className, jarPath)
    // exactly ONE supported-arity overload: executors re-resolve the
    // method by arity alone (getMethods order is unspecified per JVM),
    // so an overloaded evaluate could bind a different signature there
    // than the return DataType registered here
    val evals = cls.getMethods.filter(m =>
      m.getName == "evaluate" && m.getParameterCount >= 1 && m.getParameterCount <= 2)
    require(evals.nonEmpty,
      s"$className has no evaluate() method with 1 or 2 parameters")
    require(evals.length == 1,
      s"$className has ${evals.length} evaluate() overloads — ambiguous " +
        "executor-side binding; expose exactly one")
    val m = evals.head
    val ret = sparkType(m.getReturnType)
    m.getParameterCount match {
      case 1 => spark.udf.register(name, new Reflect1(className, jarPath), ret)
      case 2 => spark.udf.register(name, new Reflect2(className, jarPath), ret)
    }
  }
}
