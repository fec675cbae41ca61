package graft.sources

/** Hadoop `Configuration` is not `Serializable`; this is the standard
  * write()/readFields() envelope (Spark keeps its own copy of this
  * class `private[spark]`). Shared by the shard writers
  * ([[TarShards]], [[WarcShards]]).
  */
private[sources] final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
