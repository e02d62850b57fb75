package muninnavro;

import java.io.IOException;
import java.io.OutputStream;
import java.io.Serializable;
import java.math.BigDecimal;
import java.nio.ByteBuffer;
import java.util.ArrayList;
import java.util.HashMap;
import java.util.List;
import java.util.Map;
import java.util.UUID;

import org.apache.avro.Schema;
import org.apache.avro.file.CodecFactory;
import org.apache.avro.file.DataFileWriter;
import org.apache.avro.generic.GenericData;
import org.apache.avro.generic.GenericDatumWriter;
import org.apache.avro.generic.GenericRecord;
import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters;
import org.apache.spark.sql.catalyst.util.ArrayData;
import org.apache.spark.sql.catalyst.util.MapData;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.types.ArrayType;
import org.apache.spark.sql.types.BinaryType;
import org.apache.spark.sql.types.BooleanType;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DateType;
import org.apache.spark.sql.types.DecimalType;
import org.apache.spark.sql.types.DoubleType;
import org.apache.spark.sql.types.FloatType;
import org.apache.spark.sql.types.IntegerType;
import org.apache.spark.sql.types.LongType;
import org.apache.spark.sql.types.MapType;
import org.apache.spark.sql.types.StringType;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.types.TimestampNTZType;
import org.apache.spark.sql.types.TimestampType;
import org.apache.spark.util.SerializableConfiguration;

/**
 * Batch write support for the muninn Avro DataSource:
 * {@code df.write.format("avro").save(dir)} lands one OCF file per task
 * under the target directory (part-<partition>-<uuid>.avro), mapping the
 * Catalyst schema back to Avro by the inverse of the read-side rules
 * (nullable field -> ["null", X], timestamp -> long/timestamp-micros,
 * date -> int/date, decimal(p,s) -> bytes/decimal). The
 * "muninn.codec" option selects the block codec (null/deflate/snappy/
 * bzip2/xz — whatever the classpath's CodecFactory resolves).
 *
 * Commit protocol: writers create their final objects directly and
 * abort() deletes the partial file — the same relaxed contract as
 * Spark's non-transactional file sinks without a commit coordinator;
 * readers list the directory only after the write job returns.
 */
public final class AvroWriteSupport {

    private AvroWriteSupport() {}

    /** Catalyst type -> Avro schema (field-level; nullability wraps). */
    static Schema toAvroSchema(DataType dt, String recName) {
        if (dt instanceof BooleanType) {
            return Schema.create(Schema.Type.BOOLEAN);
        } else if (dt instanceof IntegerType) {
            return Schema.create(Schema.Type.INT);
        } else if (dt instanceof LongType) {
            return Schema.create(Schema.Type.LONG);
        } else if (dt instanceof FloatType) {
            return Schema.create(Schema.Type.FLOAT);
        } else if (dt instanceof DoubleType) {
            return Schema.create(Schema.Type.DOUBLE);
        } else if (dt instanceof StringType) {
            return Schema.create(Schema.Type.STRING);
        } else if (dt instanceof BinaryType) {
            return Schema.create(Schema.Type.BYTES);
        } else if (dt instanceof DateType) {
            Schema s = Schema.create(Schema.Type.INT);
            return org.apache.avro.LogicalTypes.date().addToSchema(s);
        } else if (dt instanceof TimestampType) {
            Schema s = Schema.create(Schema.Type.LONG);
            return org.apache.avro.LogicalTypes.timestampMicros().addToSchema(s);
        } else if (dt instanceof TimestampNTZType) {
            Schema s = Schema.create(Schema.Type.LONG);
            return org.apache.avro.LogicalTypes.localTimestampMicros().addToSchema(s);
        } else if (dt instanceof DecimalType) {
            DecimalType d = (DecimalType) dt;
            Schema s = Schema.create(Schema.Type.BYTES);
            return org.apache.avro.LogicalTypes.decimal(d.precision(), d.scale())
                    .addToSchema(s);
        } else if (dt instanceof ArrayType) {
            ArrayType a = (ArrayType) dt;
            Schema el = toAvroSchema(a.elementType(), recName + "_item");
            if (a.containsNull()) {
                el = nullable(el);
            }
            return Schema.createArray(el);
        } else if (dt instanceof MapType) {
            MapType m = (MapType) dt;
            if (!(m.keyType() instanceof StringType)) {
                throw new UnsupportedOperationException(
                        "avro maps need string keys, got " + m.keyType());
            }
            Schema val = toAvroSchema(m.valueType(), recName + "_value");
            if (m.valueContainsNull()) {
                val = nullable(val);
            }
            return Schema.createMap(val);
        } else if (dt instanceof StructType) {
            StructType st = (StructType) dt;
            List<Schema.Field> fields = new ArrayList<>();
            for (StructField f : st.fields()) {
                Schema fs = toAvroSchema(f.dataType(), recName + "_" + f.name());
                if (f.nullable()) {
                    fs = nullable(fs);
                }
                fields.add(new Schema.Field(
                        f.name(), fs, null,
                        f.nullable() ? Schema.Field.NULL_DEFAULT_VALUE : null));
            }
            return Schema.createRecord(recName, null, "muninnavro", false, fields);
        }
        throw new UnsupportedOperationException("cannot write " + dt + " to avro");
    }

    private static Schema nullable(Schema s) {
        return Schema.createUnion(Schema.create(Schema.Type.NULL), s);
    }

    /** Extracts one Catalyst value (by ordinal) as the Avro-model value. */
    interface Getter extends Serializable {
        Object get(SpecializedGetters g, int ordinal);
    }

    static Getter getterFor(DataType dt, Schema avro) {
        final Schema target = avro.getType() == Schema.Type.UNION
                ? avro.getTypes().get(1) : avro;
        if (dt instanceof BooleanType) {
            return (g, i) -> g.getBoolean(i);
        } else if (dt instanceof IntegerType || dt instanceof DateType) {
            return (g, i) -> g.getInt(i);
        } else if (dt instanceof LongType || dt instanceof TimestampType
                || dt instanceof TimestampNTZType) {
            return (g, i) -> g.getLong(i);
        } else if (dt instanceof FloatType) {
            return (g, i) -> g.getFloat(i);
        } else if (dt instanceof DoubleType) {
            return (g, i) -> g.getDouble(i);
        } else if (dt instanceof StringType) {
            return (g, i) -> g.getUTF8String(i).toString();
        } else if (dt instanceof BinaryType) {
            return (g, i) -> ByteBuffer.wrap(g.getBinary(i));
        } else if (dt instanceof DecimalType) {
            DecimalType d = (DecimalType) dt;
            return (g, i) -> {
                BigDecimal bd = g.getDecimal(i, d.precision(), d.scale())
                        .toJavaBigDecimal().setScale(d.scale());
                return ByteBuffer.wrap(bd.unscaledValue().toByteArray());
            };
        } else if (dt instanceof ArrayType) {
            ArrayType a = (ArrayType) dt;
            Getter el = getterFor(a.elementType(), target.getElementType());
            return (g, i) -> {
                ArrayData arr = g.getArray(i);
                List<Object> out = new ArrayList<>(arr.numElements());
                for (int j = 0; j < arr.numElements(); j++) {
                    out.add(arr.isNullAt(j) ? null : el.get(arr, j));
                }
                return out;
            };
        } else if (dt instanceof MapType) {
            MapType m = (MapType) dt;
            Getter val = getterFor(m.valueType(), target.getValueType());
            return (g, i) -> {
                MapData md = g.getMap(i);
                ArrayData ks = md.keyArray();
                ArrayData vs = md.valueArray();
                Map<String, Object> out = new HashMap<>();
                for (int j = 0; j < md.numElements(); j++) {
                    out.put(
                            ks.getUTF8String(j).toString(),
                            vs.isNullAt(j) ? null : val.get(vs, j));
                }
                return out;
            };
        } else if (dt instanceof StructType) {
            StructType st = (StructType) dt;
            StructField[] fields = st.fields();
            Getter[] subs = new Getter[fields.length];
            Schema rec = target;
            for (int j = 0; j < fields.length; j++) {
                subs[j] = getterFor(
                        fields[j].dataType(), rec.getFields().get(j).schema());
            }
            final int n = fields.length;
            final Schema recSchema = rec;
            return (g, i) -> {
                InternalRow row = g.getStruct(i, n);
                GenericRecord out = new GenericData.Record(recSchema);
                for (int j = 0; j < n; j++) {
                    out.put(j, row.isNullAt(j) ? null : subs[j].get(row, j));
                }
                return out;
            };
        }
        throw new UnsupportedOperationException("cannot write " + dt + " to avro");
    }

    // ------------------------------------------------------------------

    static final class AvroWriteBuilder implements WriteBuilder, Write, BatchWrite {
        private final String path;
        private final StructType schema;
        private final String codec;
        private final SerializableConfiguration conf;

        AvroWriteBuilder(String path, StructType schema, String codec,
                         SerializableConfiguration conf) {
            this.path = path;
            this.schema = schema;
            this.codec = codec;
            this.conf = conf;
        }

        @Override
        public Write build() {
            return this;
        }

        @Override
        public BatchWrite toBatch() {
            return this;
        }

        @Override
        public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
            try {
                Path dir = new Path(path);
                FileSystem fs = dir.getFileSystem(conf.value());
                fs.mkdirs(dir);
            } catch (IOException e) {
                throw new RuntimeException("cannot create " + path, e);
            }
            return new Factory(path, schema.json(), codec, conf);
        }

        @Override
        public void commit(WriterCommitMessage[] messages) {}

        @Override
        public void abort(WriterCommitMessage[] messages) {}
    }

    static final class Factory implements DataWriterFactory {
        private static final long serialVersionUID = 1L;
        private final String path;
        private final String schemaJson;
        private final String codec;
        private final SerializableConfiguration conf;

        Factory(String path, String schemaJson, String codec,
                SerializableConfiguration conf) {
            this.path = path;
            this.schemaJson = schemaJson;
            this.codec = codec;
            this.conf = conf;
        }

        @Override
        public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
            StructType st = (StructType) DataType.fromJson(schemaJson);
            String name = String.format(
                    "part-%05d-%s.avro", partitionId,
                    UUID.randomUUID().toString().substring(0, 8));
            try {
                return new Writer(new Path(path, name), st, codec, conf);
            } catch (IOException e) {
                throw new RuntimeException("cannot open avro writer", e);
            }
        }
    }

    static final class Writer implements DataWriter<InternalRow> {
        private final Path file;
        private final Path tmp;
        private final FileSystem fs;
        private final DataFileWriter<GenericRecord> out;
        private final Schema avro;
        private final Getter[] getters;

        Writer(Path file, StructType st, String codec,
               SerializableConfiguration conf) throws IOException {
            this.file = file;
            // write behind a dot-name and rename on commit: readers skip
            // dot/underscore files, so a task killed mid-write (no abort
            // callback) never leaves a VISIBLE partial container file;
            // speculative/retried attempts write distinct uuid names
            this.tmp = new Path(
                    file.getParent(), "." + file.getName() + ".inprogress");
            this.fs = file.getFileSystem(conf.value());
            this.avro = toAvroSchema(st, "spark_row");
            StructField[] fields = st.fields();
            this.getters = new Getter[fields.length];
            for (int i = 0; i < fields.length; i++) {
                getters[i] = getterFor(
                        fields[i].dataType(), avro.getFields().get(i).schema());
            }
            DataFileWriter<GenericRecord> w =
                    new DataFileWriter<>(new GenericDatumWriter<>(avro));
            w.setCodec(CodecFactory.fromString(codec));
            OutputStream os = fs.create(tmp, true);
            this.out = w.create(avro, os);
        }

        @Override
        public void write(InternalRow row) throws IOException {
            GenericRecord rec = new GenericData.Record(avro);
            for (int i = 0; i < getters.length; i++) {
                rec.put(i, row.isNullAt(i) ? null : getters[i].get(row, i));
            }
            out.append(rec);
        }

        @Override
        public WriterCommitMessage commit() throws IOException {
            out.close();
            if (!fs.rename(tmp, file)) {
                throw new IOException("rename failed: " + tmp + " -> " + file);
            }
            return new Done(file.toString());
        }

        @Override
        public void abort() throws IOException {
            out.close();
            fs.delete(tmp, false);
        }

        @Override
        public void close() {}
    }

    static final class Done implements WriterCommitMessage {
        private static final long serialVersionUID = 1L;
        final String path;

        Done(String path) {
            this.path = path;
        }
    }
}
