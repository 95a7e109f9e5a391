"""Change-stream sources: Debezium envelope decoding (JSON / Avro / Confluent
wire format) and the Kafka/file readStream builders."""
