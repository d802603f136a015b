"""Built-in single-page studio UI served at `/` by the API server.

Feature parity with the reference's Gradio generation surface (SURVEY §2.6:
mode radio Simple/Custom/Remix/Repaint/Extract/Lego/Complete, caption/lyrics,
metadata, LM thinking controls, batch results with audio players) as a static
page + the existing job API — no gradio dependency.
"""

STUDIO_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>ACE-Step TPU Studio</title>
<style>
  :root { color-scheme: dark; }
  body { font-family: system-ui, sans-serif; background: #111418; color: #e6e6e6;
         max-width: 900px; margin: 2rem auto; padding: 0 1rem; }
  h1 { font-size: 1.4rem; } h1 span { color: #6ae3ff; }
  fieldset { border: 1px solid #2a2f36; border-radius: 8px; margin-bottom: 1rem; }
  legend { color: #9ad; padding: 0 .4rem; }
  label { display: block; margin: .5rem 0 .15rem; font-size: .85rem; color: #aab; }
  input[type=text], input[type=number], textarea, select {
    width: 100%; box-sizing: border-box; background: #1a1f26; color: #e6e6e6;
    border: 1px solid #2a2f36; border-radius: 6px; padding: .45rem; }
  textarea { min-height: 70px; font-family: inherit; }
  .row { display: flex; gap: .8rem; } .row > div { flex: 1; }
  .modes label { display: inline-block; margin-right: .9rem; }
  button { background: #2563eb; color: white; border: 0; border-radius: 6px;
           padding: .6rem 1.4rem; font-size: 1rem; cursor: pointer; margin-top: .6rem; }
  button:disabled { background: #444; }
  #status { margin: .8rem 0; color: #9ad; min-height: 1.2em; }
  .result { background: #1a1f26; border-radius: 8px; padding: .8rem; margin: .6rem 0; }
  audio { width: 100%; }
  progress { width: 100%; height: 8px; }
  .small { font-size: .75rem; color: #778; }
</style>
</head>
<body>
<h1>ACE-Step <span>TPU</span> Studio</h1>

<fieldset class="modes"><legend>Mode</legend>
  <label><input type="radio" name="mode" value="Simple" checked> Simple</label>
  <label><input type="radio" name="mode" value="Custom"> Custom</label>
  <label><input type="radio" name="mode" value="Remix"> Remix</label>
  <label><input type="radio" name="mode" value="Repaint"> Repaint</label>
  <label><input type="radio" name="mode" value="Extract"> Extract</label>
  <label><input type="radio" name="mode" value="Lego"> Lego</label>
  <label><input type="radio" name="mode" value="Complete"> Complete</label>
</fieldset>

<fieldset><legend>Prompt</legend>
  <label>Caption</label>
  <input type="text" id="caption" placeholder="an energetic synthwave track with driving bass">
  <label>Lyrics ([Instrumental] for none)</label>
  <textarea id="lyrics">[Instrumental]</textarea>
</fieldset>

<fieldset><legend>Settings</legend>
  <div class="row">
    <div><label>Duration (s)</label><input type="number" id="duration" value="30" min="10" max="600"></div>
    <div><label>BPM</label><input type="number" id="bpm" placeholder="auto"></div>
    <div><label>Key</label><input type="text" id="keyscale" placeholder="auto"></div>
    <div><label>Seed</label><input type="number" id="seed" value="-1"></div>
  </div>
  <div class="row">
    <div><label>Batch</label><input type="number" id="batch" value="1" min="1" max="8"></div>
    <div><label>Steps</label><input type="number" id="steps" value="8" min="1" max="100"></div>
    <div><label>Guidance</label><input type="number" id="guidance" value="7.0" step="0.5"></div>
    <div><label>Format</label>
      <select id="format"><option>wav</option><option>flac</option><option>mp3</option></select>
    </div>
  </div>
  <label><input type="checkbox" id="thinking" checked> LM thinking (CoT metadata + codes)</label>
  <div class="row" id="repaintRow" style="display:none">
    <div><label>Repaint start (s)</label><input type="number" id="rstart" value="0"></div>
    <div><label>Repaint end (s)</label><input type="number" id="rend" value="-1"></div>
  </div>
</fieldset>

<button id="go">Generate</button>
<div id="status"></div>
<progress id="bar" value="0" max="1" style="display:none"></progress>
<div id="results"></div>

<script>
const MODE_TASK = {Simple:"text2music", Custom:"text2music", Remix:"cover",
                   Repaint:"repaint", Extract:"extract", Lego:"lego", Complete:"complete"};
const $ = id => document.getElementById(id);
document.querySelectorAll('input[name=mode]').forEach(r => r.onchange = () => {
  $("repaintRow").style.display =
    (document.querySelector('input[name=mode]:checked').value === "Repaint") ? "flex" : "none";
});
async function post(path, body) {
  const r = await fetch(path, {method: "POST", headers: {"Content-Type": "application/json"},
                               body: JSON.stringify(body)});
  return r.json();
}
$("go").onclick = async () => {
  const mode = document.querySelector('input[name=mode]:checked').value;
  const payload = {
    caption: $("caption").value, lyrics: $("lyrics").value,
    duration: parseFloat($("duration").value), seed: parseInt($("seed").value),
    batch_size: parseInt($("batch").value), inference_steps: parseInt($("steps").value),
    guidance_scale: parseFloat($("guidance").value),
    thinking: $("thinking").checked, task_type: MODE_TASK[mode],
    audio_format: $("format").value,
  };
  if ($("bpm").value) payload.bpm = parseInt($("bpm").value);
  if ($("keyscale").value) payload.keyscale = $("keyscale").value;
  if (mode === "Repaint") {
    payload.repainting_start = parseFloat($("rstart").value);
    payload.repainting_end = parseFloat($("rend").value);
  }
  $("go").disabled = true; $("bar").style.display = "block";
  $("status").textContent = "submitting…";
  try {
    const {task_id} = await post("/release_task", payload);
    $("status").textContent = "queued: " + task_id;
    for (;;) {
      await new Promise(res => setTimeout(res, 1500));
      const out = await post("/query_result", {task_ids: [task_id]});
      const st = out.results[0];
      $("bar").value = st.progress || 0;
      if (st.status === 1) {
        $("status").textContent = "done";
        const div = document.createElement("div"); div.className = "result";
        (st.result.audio_paths || []).forEach((p, i) => {
          const a = document.createElement("audio"); a.controls = true;
          a.src = "/v1/audio?path=" + encodeURIComponent(p);
          const cap = document.createElement("div"); cap.className = "small";
          cap.textContent = p + "  seed=" + (st.result.seeds || [])[i];
          div.appendChild(cap); div.appendChild(a);
        });
        const meta = document.createElement("pre"); meta.className = "small";
        meta.textContent = st.result.metas || "";
        div.appendChild(meta);
        $("results").prepend(div);
        break;
      }
      if (st.status === 2) { $("status").textContent = "failed: " + (st.error || "").slice(0, 400); break; }
      $("status").textContent = "running… " + Math.round((st.progress || 0) * 100) + "%";
    }
  } catch (e) { $("status").textContent = "error: " + e; }
  $("go").disabled = false; $("bar").style.display = "none";
};
</script>
</body>
</html>
"""
