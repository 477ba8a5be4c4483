package graft.functions

import org.apache.hadoop.hive.ql.exec.UDF

/** Hive-interface UDF registered by CLASS NAME through SQL — the
  * reference's jar-shipped function form (ref:
  * windowed_lagN_awskms_postgres_date_partition.py:61-64 registers
  * `create temporary function geog_ip_ext as 'com.acme...GeogIPExt'`
  * from a jar on the cluster classpath). The class implements the Hive
  * UDF contract, so it is loadable by any engine that speaks it; here it
  * maps an IPv4 string to a deterministic region bucket — the SHAPE of a
  * geo-IP lookup with the .mmdb database replaced by arithmetic (the
  * sidecar-file dependency is environment, not engine).
  *
  * Null contract matches Hive: null or unparseable input → null output.
  */
class RegionOfIpUdf extends UDF {
  def evaluate(ip: String): String = {
    if (ip == null) return null
    val parts = ip.split("\\.")
    if (parts.length != 4) return null
    try {
      val oct = parts.map(_.toInt)
      if (oct.exists(o => o < 0 || o > 255)) null
      else s"REGION_${(oct(0) * 7 + oct(1)) % 5}"
    } catch { case _: NumberFormatException => null }
  }
}
