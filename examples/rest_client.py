"""REST client example: JSON text2music + multipart repaint upload.

Start a server first:
    python -m acestep_tpu.cli serve --random-init --port 8001
Then:
    python examples/rest_client.py --port 8001 [--wav path/to/song.wav]
"""

import argparse
import json
import http.client
import time

parser = argparse.ArgumentParser()
parser.add_argument("--host", default="127.0.0.1")
parser.add_argument("--port", type=int, default=8001)
parser.add_argument("--wav", default=None, help="source WAV for a repaint demo")
args = parser.parse_args()


def post(path, body, headers):
    conn = http.client.HTTPConnection(args.host, args.port, timeout=120)
    conn.request("POST", path, body=body, headers=headers)
    out = json.loads(conn.getresponse().read())
    conn.close()
    return out


def post_json(path, payload):
    return post(path, json.dumps(payload), {"Content-Type": "application/json"})


def wait(task_id):
    while True:
        st = post_json("/query_result", {"task_ids": [task_id]})["results"][0]
        if st["status"] == 1:
            return st["result"]
        if st["status"] == 2:
            raise RuntimeError(st.get("error"))
        print(f"  progress {st.get('progress', 0):.0%}")
        time.sleep(2)


# --- plain JSON text2music with auto LRC + lyric quality score ---
task = post_json("/release_task", {
    "caption": "an energetic synthwave track", "lyrics": "la la la\nhey hey",
    "duration": 20, "thinking": False, "audio_format": "wav", "seed": 7,
    "auto_lrc": True, "auto_score": True,
})
print("text2music queued:", task["task_id"])
result = wait(task["task_id"])
print("  audio:", result["audio_paths"])
print("  lyric scores:", result.get("lyrics_scores"))
if result.get("lrcs") and result["lrcs"][0]:
    print("  LRC:\n" + result["lrcs"][0])

# --- multipart repaint with a source upload ---
if args.wav:
    with open(args.wav, "rb") as f:
        wav_bytes = f.read()
    boundary = "exampleboundary"
    fields = {"task_type": "repaint", "caption": "rework the chorus",
              "duration": "20", "thinking": "false", "audio_format": "wav",
              "repainting_start": "0.0", "repainting_end": "5.0"}
    parts = [
        (f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"\r\n\r\n{v}\r\n').encode()
        for k, v in fields.items()
    ]
    parts.append(
        (f'--{boundary}\r\nContent-Disposition: form-data; name="src_audio"; '
         f'filename="src.wav"\r\nContent-Type: audio/wav\r\n\r\n').encode()
        + wav_bytes + b"\r\n"
    )
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)
    task = post("/release_task", body,
                {"Content-Type": f"multipart/form-data; boundary={boundary}"})
    print("repaint queued:", task["task_id"])
    result = wait(task["task_id"])
    print("  audio:", result["audio_paths"])
