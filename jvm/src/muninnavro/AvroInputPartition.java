package muninnavro;

import org.apache.spark.sql.connector.read.InputPartition;

/** One byte range of one Avro file; the reader aligns to sync markers. */
public class AvroInputPartition implements InputPartition {
    private static final long serialVersionUID = 1L;

    final String path;
    final long start;
    final long length;

    AvroInputPartition(String path, long start, long length) {
        this.path = path;
        this.start = start;
        this.length = length;
    }
}
