

def test_read_binary_files(spark, tmp_path):
    from lsh_spark.sources.formats import read_binary_files

    (tmp_path / "a.bin").write_bytes(b"\x00\x01media-a")
    (tmp_path / "b.bin").write_bytes(b"\x02media-bb")
    (tmp_path / "skip.txt").write_text("not media")
    df = read_binary_files(spark, str(tmp_path), path_glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert bytes(rows["a.bin"].content) == b"\x00\x01media-a"
    assert rows["b.bin"].length == 9


def test_read_avro_gated(spark, tmp_path):
    import pytest

    from lsh_spark.sources.formats import read_avro

    with pytest.raises(RuntimeError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "missing.avro"))


def test_read_text_lines_and_whole(spark, tmp_path):
    from lsh_spark.sources.formats import read_text

    (tmp_path / "a.txt").write_text("line one\nline two\n")
    (tmp_path / "b.txt").write_text("solo")
    lines = {r.value for r in read_text(spark, str(tmp_path)).collect()}
    assert lines == {"line one", "line two", "solo"}
    whole = {r.value for r in
             read_text(spark, str(tmp_path), whole_file=True).collect()}
    assert whole == {"line one\nline two\n", "solo"}
