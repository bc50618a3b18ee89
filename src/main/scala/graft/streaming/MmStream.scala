package graft.streaming

import org.apache.spark.sql.Dataset

import graft.operators.{MediaBlob, MediaFeatures, MultimodalOps}

/** Streaming multimodal batch processing (SURVEY §G streaming row):
  * the same partition-batched binary decode as the batch op, applied
  * to a stream — each micro-batch's partitions hit the (stubbed)
  * decoder through the identical mapPartitions boundary, so swapping
  * in a real decoder changes one function for both batch and stream.
  */
object MmStream {
  def decode(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(batch => batch.map(MultimodalOps.decodeStub))
  }
}
