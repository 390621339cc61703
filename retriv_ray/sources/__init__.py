from retriv_ray.sources.transcripts import (  # noqa: F401
    make_transcripts_dataset,
    shane_transcripts,
    transcripts_table,
    write_transcripts,
)
