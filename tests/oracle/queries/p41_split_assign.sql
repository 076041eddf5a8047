SELECT doc_id,
           CASE WHEN (('0x' || substr(md5(doc_id::VARCHAR || '_7'), 1, 15))::BIGINT)
                     < 922337203685477632 THEN 'train'
                WHEN (('0x' || substr(md5(doc_id::VARCHAR || '_7'), 1, 15))::BIGINT)
                     < 1037629354146162304 THEN 'val'
                ELSE 'test' END AS split
    FROM documents ORDER BY doc_id
