package muninnavro;

import java.io.IOException;
import java.util.List;

import org.apache.avro.Schema;
import org.apache.avro.file.DataFileReader;
import org.apache.avro.generic.GenericDatumReader;
import org.apache.avro.generic.GenericRecord;
import org.apache.avro.mapred.FsInput;
import org.apache.hadoop.fs.Path;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.unsafe.types.UTF8String;
import org.apache.spark.util.SerializableConfiguration;

/** Creates per-split readers: open, seek to the first sync marker at or
 * after the split start, decode until past the split end. The reader
 * schema is the PRUNED projection of the writer schema, so avro's
 * resolving decoder skips (never materializes) unrequested fields. */
public class AvroReaderFactory implements PartitionReaderFactory {
    private static final long serialVersionUID = 1L;

    private final String requiredJson;
    private final String pathColumn;
    private final SerializableConfiguration conf;

    AvroReaderFactory(String requiredJson, String pathColumn,
                      SerializableConfiguration conf) {
        this.requiredJson = requiredJson;
        this.pathColumn = pathColumn;
        this.conf = conf;
    }

    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
        AvroInputPartition p = (AvroInputPartition) partition;
        StructType required = (StructType) DataType.fromJson(requiredJson);
        try {
            return new Reader(p, required, pathColumn, conf);
        } catch (IOException e) {
            throw new RuntimeException("opening avro split failed: " + p.path, e);
        }
    }

    static final class Reader implements PartitionReader<InternalRow> {
        private final DataFileReader<GenericRecord> reader;
        private final long end;
        private final AvroConverters.Conv[] convs;
        private final int[] readerPos;
        private final int nOut;
        private final int pathSlot;
        private final UTF8String pathValue;
        private GenericRecord current;

        Reader(AvroInputPartition p, StructType required, String pathColumn,
               SerializableConfiguration conf) throws IOException {
            FsInput in = new FsInput(new Path(p.path), conf.value());
            // open with the writer schema, then re-resolve against the
            // pruned reader schema for projection pushdown
            DataFileReader<GenericRecord> probe =
                    new DataFileReader<>(in, new GenericDatumReader<>());
            Schema writer = probe.getSchema();
            probe.close();

            StructType avroFields = pathColumn.isEmpty()
                    ? required : dropField(required, pathColumn);
            Schema readerSchema = AvroConverters.pruneWriterSchema(writer, avroFields);
            GenericDatumReader<GenericRecord> datum =
                    new GenericDatumReader<>(writer, readerSchema);
            this.reader = new DataFileReader<>(
                    new FsInput(new Path(p.path), conf.value()), datum);
            reader.sync(p.start);
            this.end = p.start + p.length;

            // map each output slot to its position in the reader record
            List<Schema.Field> rf = readerSchema.getFields();
            this.nOut = required.fields().length;
            this.convs = new AvroConverters.Conv[nOut];
            this.readerPos = new int[nOut];
            int slot = -1;
            StructField[] fields = required.fields();
            for (int i = 0; i < nOut; i++) {
                if (!pathColumn.isEmpty() && fields[i].name().equals(pathColumn)) {
                    slot = i;
                    readerPos[i] = -1;
                    continue;
                }
                Schema.Field f = readerSchema.getField(fields[i].name());
                if (f == null) {
                    readerPos[i] = -2; // absent from the writer: NULL-fill
                    continue;
                }
                readerPos[i] = f.pos();
                // compile against the REQUIRED Catalyst type: projects
                // nested-pruned structs by name (positional emission of a
                // superset record would silently mis-read non-prefix
                // subfields) and throws a loud schema-drift error when
                // this FILE's writer schema decodes to a different type
                // than the scan schema (which came from the first file)
                try {
                    convs[i] = AvroConverters.compileFor(
                            f.schema(), fields[i].dataType());
                } catch (IllegalStateException e) {
                    throw new IOException(
                            e.getMessage() + " (file: " + p.path + ", field '"
                            + fields[i].name() + "')", e);
                }
            }
            this.pathSlot = slot;
            this.pathValue = UTF8String.fromString(p.path);
        }

        private static StructType dropField(StructType st, String name) {
            StructType out = new StructType();
            for (StructField f : st.fields()) {
                if (!f.name().equals(name)) {
                    out = out.add(f);
                }
            }
            return out;
        }

        @Override
        public boolean next() throws IOException {
            if (reader.hasNext() && !reader.pastSync(end)) {
                // datum reuse is safe: get() copies every leaf value out of
                // the record (strings/bytes/fixed byte-copied, containers
                // rebuilt), so nothing escapes that the next read mutates
                current = reader.next(current);
                return true;
            }
            return false;
        }

        @Override
        public InternalRow get() {
            Object[] out = new Object[nOut];
            for (int i = 0; i < nOut; i++) {
                if (i == pathSlot) {
                    out[i] = pathValue;
                } else if (readerPos[i] >= 0) {
                    out[i] = convs[i].apply(current.get(readerPos[i]));
                }
            }
            return new GenericInternalRow(out);
        }

        @Override
        public void close() throws IOException {
            reader.close();
        }
    }
}
